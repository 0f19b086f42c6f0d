package graft.catalog

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed `Dataset[T]` views of the test tables — compile-time field
  * checks for pipelines where the schema is static (SURVEY.md §1.2:
  * typed staging layer is the idiomatic choice; `DataFrame` remains
  * the dynamic-schema surface).
  */
object Typed {

  final case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                            l_linenumber: Int, l_quantity: Double,
                            l_extendedprice: Double, l_discount: Double,
                            l_tax: Double, l_returnflag: String,
                            l_linestatus: String, l_shipdate: java.sql.Timestamp)

  final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                         o_totalprice: Double, o_orderdate: java.sql.Timestamp,
                         o_orderpriority: String)

  final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                            c_acctbal: Double, c_mktsegment: String)

  final case class Document(doc_id: Long, text: String, lang: String,
                            source: String, n_chars: Long)

  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  def lineitem(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables(spark, dir).lineitem.as[Lineitem]
  }
  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables(spark, dir).orders.as[Order]
  }
  def customer(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables(spark, dir).customer.as[Customer]
  }
  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables(spark, dir).documents.as[Document]
  }
  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables(spark, dir).embeddings.as[Embedding]
  }
}

package graft.pipeline

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.SparkSpec

/** D2 semantics (reference `retries=2`, `orders_ETL.py:35`) and the
  * conscious D3 divergence (fail fast after retries, not swallow).
  */
class RetrySpec extends SparkSpec {

  private class Flaky(failures: Int) extends Pipeline {
    val name = "flaky"
    val attempts = new AtomicInteger(0)
    var loaded: Long = -1
    def extract(s: SparkSession): DataFrame = {
      if (attempts.incrementAndGet() <= failures)
        throw new RuntimeException(s"transient #${attempts.get}")
      s.range(5).toDF("v")
    }
    def transform(df: DataFrame): DataFrame = df
    def load(df: DataFrame): Unit = loaded = df.count()
  }

  test("a stage failing <= retries times succeeds on a later attempt") {
    val p = new Flaky(failures = 2) // retries = 2 → 3 attempts allowed
    p.run(spark)
    assert(p.attempts.get == 3)
    assert(p.loaded == 5)
  }

  test("a stage failing more than retries times fails the pipeline fast") {
    val p = new Flaky(failures = 3)
    val e = intercept[RuntimeException](p.run(spark))
    assert(e.getMessage.contains("failed after 3 attempts"))
    assert(p.loaded == -1) // downstream stages never ran
  }
}

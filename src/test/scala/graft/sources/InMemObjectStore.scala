package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, InputStream, OutputStream}
import java.net.URI
import java.util.concurrent.{ConcurrentHashMap, ConcurrentSkipListMap, ConcurrentSkipListSet}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** TEST-ONLY in-process object store registered under the `s3a://`
  * scheme (`fs.s3a.impl` → this class). The real S3A connector
  * (hadoop-aws) does not ship in this zero-egress container, so real
  * unsigned-S3 reads (reference `orders_ETL.py:46-52`) stay
  * environmentally untestable — but everything BELOW the wire can be
  * exercised: that the engine's sources/sinks pass every path through
  * the Hadoop FileSystem layer (no `java.io.File` assumptions), that
  * partitioned CSV/parquet writes commit correctly through a
  * rename-based committer against a flat object namespace, and that
  * reads seek (parquet footers) and list through the same layer.
  *
  * Semantics modeled on an object store with the directory emulation
  * every Hadoop object-store connector performs: a flat
  * key → bytes map per bucket (the URI authority), directories
  * inferred from key prefixes plus explicit zero-byte dir markers for
  * `mkdirs`, HDFS-style `rename(src, dstDir)` moving src UNDER an
  * existing destination directory (what FileOutputCommitter's task
  * commit does).
  */
class InMemObjectStore extends FileSystem {
  import InMemObjectStore._

  private var uri: URI = _
  private var workingDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    uri = URI.create(name.getScheme + "://" + name.getAuthority)
    workingDir = new Path(uri.toString + "/")
    setConf(conf)
  }

  override def getUri: URI = uri
  override def getScheme: String = "s3a"
  override def getWorkingDirectory: Path = workingDir
  override def setWorkingDirectory(dir: Path): Unit = { workingDir = dir }

  private def store: Bucket = bucketFor(uri.getAuthority)

  /** Bucket-relative key: no leading slash, "" for the root. */
  private def key(p: Path): String = {
    val q = p.makeQualified(uri, workingDir).toUri.getPath
    q.stripPrefix("/").stripSuffix("/")
  }

  private def fileStatus(k: String, bytes: Array[Byte]): FileStatus =
    new FileStatus(bytes.length.toLong, false, 1, 32 * 1024 * 1024,
      store.mtime.getOrDefault(k, 0L), new Path(uri.toString + "/" + k))

  private def dirStatus(k: String): FileStatus =
    new FileStatus(0L, true, 1, 0L, 0L,
      new Path(uri.toString + (if (k.isEmpty) "/" else "/" + k)))

  private def isImplicitDir(k: String): Boolean = {
    val prefix = if (k.isEmpty) "" else k + "/"
    val ceiling = store.objects.ceilingKey(prefix)
    k.isEmpty || store.dirs.contains(k) ||
      (ceiling != null && ceiling.startsWith(prefix))
  }

  override def getFileStatus(f: Path): FileStatus = {
    val k = key(f)
    val bytes = store.objects.get(k)
    if (bytes != null) fileStatus(k, bytes)
    else if (isImplicitDir(k)) dirStatus(k)
    else throw new FileNotFoundException(s"$f")
  }

  override def exists(f: Path): Boolean =
    try { getFileStatus(f); true } catch { case _: FileNotFoundException => false }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    if (store.objects.containsKey(k)) return Array(fileStatus(k, store.objects.get(k)))
    if (!isImplicitDir(k)) throw new FileNotFoundException(s"$f")
    val prefix = if (k.isEmpty) "" else k + "/"
    val children = scala.collection.mutable.LinkedHashMap[String, FileStatus]()
    // immediate children: files directly under the prefix, one dir
    // entry per deeper first segment
    val it = store.objects.tailMap(prefix).entrySet().iterator()
    var done = false
    while (it.hasNext && !done) {
      val e = it.next()
      if (!e.getKey.startsWith(prefix)) done = true
      else {
        val rest = e.getKey.substring(prefix.length)
        val slash = rest.indexOf('/')
        if (slash < 0) children(rest) = fileStatus(e.getKey, e.getValue)
        else {
          val seg = rest.substring(0, slash)
          if (!children.contains(seg)) children(seg) = dirStatus(prefix + seg)
        }
      }
    }
    val dit = store.dirs.tailSet(prefix).iterator()
    var ddone = false
    while (dit.hasNext && !ddone) {
      val d = dit.next()
      if (!d.startsWith(prefix)) ddone = true
      else {
        val rest = d.substring(prefix.length)
        if (rest.nonEmpty) {
          val seg = rest.split('/').head
          if (!children.contains(seg)) children(seg) = dirStatus(prefix + seg)
        }
      }
    }
    children.values.toArray
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    var k = key(f)
    while (k.nonEmpty) {
      store.dirs.add(k)
      k = k.lastIndexOf('/') match {
        case -1 => ""
        case i  => k.substring(0, i)
      }
    }
    true
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = store.objects.get(key(f))
    if (bytes == null) throw new FileNotFoundException(s"$f")
    new FSDataInputStream(new SeekableBytes(bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    if (!overwrite && store.objects.containsKey(k))
      throw new java.io.IOException(s"already exists: $f")
    val buf = new ByteArrayOutputStream()
    val sink: OutputStream = new OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = buf.write(b, off, len)
      override def close(): Unit = {
        store.objects.put(k, buf.toByteArray)
        store.mtime.put(k, System.currentTimeMillis())
      }
    }
    new FSDataOutputStream(sink, null)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("append on object store")

  override def rename(src: Path, dst: Path): Boolean = {
    val s = key(src)
    var d = key(dst)
    if (store.objects.containsKey(s)) {
      if (isImplicitDir(d) && !store.objects.containsKey(d)) d = d + "/" + src.getName
      store.objects.put(d, store.objects.remove(s))
      store.mtime.put(d, store.mtime.getOrDefault(s, System.currentTimeMillis()))
      return true
    }
    if (!isImplicitDir(s)) return false
    // directory move; HDFS semantics: into dst when dst exists as dir
    if (isImplicitDir(d) && d.nonEmpty) d = d + "/" + src.getName
    val prefix = s + "/"
    val keys = new java.util.ArrayList[String]()
    val it = store.objects.tailMap(prefix).keySet().iterator()
    var done = false
    while (it.hasNext && !done) {
      val k = it.next()
      if (k.startsWith(prefix)) keys.add(k) else done = true
    }
    keys.forEach { k =>
      val nk = d + "/" + k.substring(prefix.length)
      store.objects.put(nk, store.objects.remove(k))
      store.mtime.put(nk, store.mtime.getOrDefault(k, System.currentTimeMillis()))
    }
    val dkeys = new java.util.ArrayList[String]()
    store.dirs.tailSet(s).forEach { dk =>
      if (dk == s || dk.startsWith(prefix)) dkeys.add(dk)
    }
    dkeys.forEach { dk =>
      store.dirs.remove(dk)
      store.dirs.add(if (dk == s) d else d + "/" + dk.substring(prefix.length))
    }
    mkdirs(new Path("/" + d), null)
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    if (store.objects.remove(k) != null) { store.mtime.remove(k); return true }
    if (!isImplicitDir(k)) return false
    val prefix = if (k.isEmpty) "" else k + "/"
    val keys = new java.util.ArrayList[String]()
    val it = store.objects.tailMap(prefix).keySet().iterator()
    var done = false
    while (it.hasNext && !done) {
      val kk = it.next()
      if (kk.startsWith(prefix)) keys.add(kk) else done = true
    }
    if (!keys.isEmpty && !recursive)
      throw new java.io.IOException(s"non-empty directory: $f")
    keys.forEach { kk => store.objects.remove(kk); store.mtime.remove(kk) }
    val dkeys = new java.util.ArrayList[String]()
    store.dirs.tailSet(k).forEach { dk =>
      if (dk == k || dk.startsWith(prefix)) dkeys.add(dk)
    }
    dkeys.forEach(store.dirs.remove(_))
    true
  }
}

object InMemObjectStore {
  final class Bucket {
    val objects = new ConcurrentSkipListMap[String, Array[Byte]]()
    val mtime = new ConcurrentHashMap[String, java.lang.Long]()
    val dirs = new ConcurrentSkipListSet[String]()
  }
  private val buckets = new ConcurrentHashMap[String, Bucket]()
  def bucketFor(name: String): Bucket =
    buckets.computeIfAbsent(name, _ => new Bucket)
  def clear(): Unit = buckets.clear()

  /** Byte-array input stream with the Seekable + PositionedReadable
    * surface parquet's footer reads need.
    */
  private final class SeekableBytes(bytes: Array[Byte])
      extends InputStream with Seekable with PositionedReadable {
    private var pos = 0
    override def read(): Int =
      if (pos >= bytes.length) -1 else { val b = bytes(pos) & 0xff; pos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= bytes.length) return -1
      val n = math.min(len, bytes.length - pos)
      System.arraycopy(bytes, pos, b, off, n); pos += n; n
    }
    override def available(): Int = bytes.length - pos
    override def seek(p: Long): Unit = {
      if (p < 0 || p > bytes.length) throw new java.io.EOFException(s"seek $p")
      pos = p.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(length, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, buffer, offset, n); n
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
      if (position + length > bytes.length) throw new java.io.EOFException()
      System.arraycopy(bytes, position.toInt, buffer, offset, length)
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}

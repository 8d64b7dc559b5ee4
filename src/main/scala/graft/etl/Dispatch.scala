package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/target coordinate dispatch (reference S4/S5/K3,
  * `tools/sources.py:57-73`, `tools/outputs.py:323-345`): `--inputs` and
  * `--output` each accept
  *
  *   - `minio:user:pass@http://host:port/bucket/folder` — an S3-compatible
  *     object store; mapped here to Hadoop S3A configuration so the same
  *     CSV/TSV readers and writers stream through `s3a://` paths (the
  *     reference drives boto3 multipart uploads; S3A's committer does the
  *     multipart dance for us),
  *   - a SQL database URL (`jdbc:...`, or an SQLAlchemy-style
  *     `scheme://...` which is passed to the JDBC driver as
  *     `jdbc:scheme://...`),
  *   - anything else: a local/Hadoop directory of `<table>.csv` inputs or
  *     `<table>.tsv` outputs.
  *
  * MinIO sources read TAB-separated objects, matching the reference's
  * `minio_source_object(value, "\t")` (`tools/sources.py:63`).
  */
object Dispatch {

  /** `minio:` URL anatomy (reference `tools/outputs.py:257-276`). */
  final case class MinioUrl(user: String, password: String, protocol: String,
                            host: String, port: String, bucket: String, folder: String) {
    def endpoint: String = s"$protocol://$host:$port"
    /** Base path of the bucket folder as a Hadoop S3A location. */
    def s3aPath: String = {
      val f = folder.stripSuffix("/")
      if (f.isEmpty) s"s3a://$bucket" else s"s3a://$bucket/$f"
    }
  }

  object MinioUrl {
    // same component grammar as the reference's MINIO_URL_PATTERN
    private val Pattern =
      "^minio:([^:]+):([^@]+)@(https?)://([^:/]+):(\\d+)/([^/]+)/?(.*)$".r

    def parse(text: String): MinioUrl = text match {
      case Pattern(u, p, proto, h, port, b, f) => MinioUrl(u, p, proto, h, port, b, f)
      case _ => throw new IllegalArgumentException(s"malformed minio URL text='$text'")
    }
  }

  def isMinio(coordinate: String): Boolean = coordinate.startsWith("minio:")

  /** SQLAlchemy-ish dispatch rule: any `scheme://...` that isn't minio is a
    * database (reference `sources.py:68-71`); `jdbc:` URLs pass through. */
  def isSql(coordinate: String): Boolean =
    coordinate.startsWith("jdbc:") || coordinate.matches("[\\w]+://.+")

  def toJdbcUrl(coordinate: String): String =
    if (coordinate.startsWith("jdbc:")) coordinate else s"jdbc:$coordinate"

  /** Set the session-wide S3A endpoint/credentials for a MinIO bucket and
    * return the bucket folder as an `s3a://` base path. Uses per-bucket
    * configuration so two MinIO coordinates with different credentials can
    * coexist in one session. */
  def configureMinio(spark: SparkSession, m: MinioUrl): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val prefix = s"fs.s3a.bucket.${m.bucket}"
    conf.set(s"$prefix.endpoint", m.endpoint)
    conf.set(s"$prefix.access.key", m.user)
    conf.set(s"$prefix.secret.key", m.password)
    conf.set(s"$prefix.path.style.access", "true") // MinIO is path-style
    conf.set(s"$prefix.connection.ssl.enabled", (m.protocol == "https").toString)
    m.s3aPath
  }

  /** A reader of named source tables from a coordinate string. */
  def sourceReader(spark: SparkSession, coordinate: String, sep: String = ","): String => DataFrame =
    if (isMinio(coordinate)) {
      val base = configureMinio(spark, MinioUrl.parse(coordinate))
      name => CsvSource.read(spark, base, name, sep = "\t")
    } else if (isSql(coordinate)) {
      val url = toJdbcUrl(coordinate)
      name => CsvSource.withRowIdx(Jdbc.readTable(spark, url, CsvSource.stripCsvExtension(name)))
    } else {
      // a directory source prefers <table>.parquet when present (Spark-
      // native columnar input — splittable, pushdown-friendly), falling
      // back to the reference's <table>.csv contract
      name => {
        val base = CsvSource.stripCsvExtension(name)
        val pq = new java.io.File(s"$coordinate/$base.parquet")
        if (pq.exists())
          CsvSource.withRowIdx(CsvSource.allString(spark.read.parquet(pq.getPath)))
        else CsvSource.read(spark, coordinate, name, sep)
      }
    }

  /** A writer of named output tables to a coordinate string. */
  def outputTarget(spark: SparkSession, coordinate: String): (String, DataFrame) => Unit =
    if (isMinio(coordinate)) {
      val base = configureMinio(spark, MinioUrl.parse(coordinate))
      (name, df) => TsvSink.writeSingleFile(df, s"$base/$name.tsv")
    } else if (isSql(coordinate)) {
      val url = toJdbcUrl(coordinate)
      (name, df) => Jdbc.writeTable(df, url, name)
    } else {
      (name, df) => TsvSink.writeSingleFile(df, s"$coordinate/$name.tsv")
    }
}

package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S3 — the reference's MongoDB load, shippable without a live mongod.
  *
  * The reference's actual load path is NOT a driver API: it dumps the
  * shaped documents to a JSON file and bulk-loads with `mongoimport`
  * (main.ipynb cell 31 — 385,777 docs at 14.2 MB/s). This module
  * reproduces that contract end-to-end:
  *
  *   - [[MongoImportSink]] writes newline-delimited MongoDB Extended
  *     JSON (v2, canonical mode) that `mongoimport --type json` ingests
  *     unmodified. Canonical mode matters: plain JSON numbers land in
  *     Mongo as doubles, silently widening every int64 id — the
  *     `{"$numberLong": "…"}` / `{"$date": …}` wrappers are how the
  *     integral types and timestamps survive the import. Writes are
  *     partition-parallel text (one file per task, same as every other
  *     sink); mongoimport fans out over the part-files.
  *
  *   - [[MongoSinkConfig]] validates the live-connector path (the
  *     `format("mongodb")` wiring in [[FormatSink]]) at plan time:
  *     URI scheme, database/collection naming rules, and the
  *     field-name constraints Mongo enforces server-side ('$'-prefixed
  *     or dotted top-level keys are rejected at insert). A bad config
  *     fails in the driver with the offending name, not N executors
  *     deep into a 100 TB write.
  */
object MongoExtendedJson {

  /** Rewrite a column so `to_json` emits canonical Extended JSON:
    * integral types wrap as `$numberLong`/`$numberInt`, timestamps AND
    * dates as `{"$date": {"$numberLong": epochMillis}}` (the canonical
    * form; a date-only `$date` string is NOT valid Extended JSON v2 —
    * mongoimport's parser requires a full ISO date-time or the
    * canonical millis wrapper, so dates travel as midnight-UTC
    * millis = epochDays × 86400000), containers recurse.
    * Doubles/strings/booleans are valid Extended JSON as-is (relaxed
    * doubles are accepted by mongoimport and keep the payload
    * readable). Timestamp millis come from `unix_millis` — integer
    * floor division in the engine, exact for pre-1970 instants and
    * far-future dates alike (a double division would round-trip
    * through FP and truncate toward zero, off by 1 ms for negative
    * sub-ms instants).
    *
    * String MAP keys are guarded at runtime: a key with a '$' prefix
    * or a dot becomes a subdocument field name in the dump, which the
    * server rejects at insert (or worse, collides with an
    * Extended-JSON wrapper) — schema-level [[invalidFieldNames]]
    * can't see data-dependent keys, so the guard rides the encode
    * expression itself and fails the write job naming the key. */
  private[sinks] def extend(c: Column, dt: DataType): Column = dt match {
    case LongType =>
      nullSafe(c, struct(c.cast(StringType).as("$numberLong")))
    case IntegerType | ShortType | ByteType =>
      nullSafe(c, struct(c.cast(StringType).as("$numberInt")))
    case TimestampType =>
      nullSafe(c, struct(
        struct(unix_millis(c).cast(StringType)
          .as("$numberLong")).as("$date")))
    case DateType =>
      nullSafe(c, struct(
        struct((unix_date(c).cast(LongType) * 86400000L).cast(StringType)
          .as("$numberLong")).as("$date")))
    case ArrayType(et, _) => transform(c, x => extend(x, et))
    case MapType(kt, vt, _) =>
      val guarded = kt match {
        case StringType => transform_keys(c, (k, _) =>
          when(k.startsWith("$") || k.contains("."),
            raise_error(concat(
              lit("map key MongoDB rejects ('$'-prefix or dot): "), k)))
            .otherwise(k))
        case _ => c
      }
      transform_values(guarded, (_, v) => extend(v, vt))
    case st: StructType =>
      nullSafe(c, struct(st.fields.toSeq.map(f =>
        extend(c.getField(f.name), f.dataType).as(f.name)): _*))
    case _ => c
  }

  private def nullSafe(src: Column, wrapped: Column): Column =
    when(src.isNotNull, wrapped)

  /** The whole row as one Extended-JSON line. */
  def toExtendedJsonLine(df: DataFrame): Column =
    to_json(struct(df.schema.fields.toSeq.map(f =>
      extend(col(f.name), f.dataType).as(f.name)): _*))

  /** Mongo rejects '$'-prefixed and dotted field names at insert; a
    * Spark schema is the cheap place to catch them. Checks every
    * nesting level (struct fields travel as subdocuments). Runtime
    * MAP keys are data, not schema — [[extend]] guards those per-row
    * inside the encode expression. */
  def invalidFieldNames(schema: StructType, prefix: String = ""): Seq[String] = {
    schema.fields.toSeq.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      val self =
        if (f.name.startsWith("$") || f.name.contains(".")) Seq(path) else Nil
      self ++ (f.dataType match {
        case st: StructType => invalidFieldNames(st, path)
        case ArrayType(st: StructType, _) => invalidFieldNames(st, path)
        case MapType(_, st: StructType, _) => invalidFieldNames(st, path)
        case _ => Nil
      })
    }
  }
}

/** Validated options for the live MongoDB Spark connector write
  * (`FormatSink("mongodb", cfg.toOptions)`). Naming rules are the
  * server's own: database names reject `/\. "$` and NUL, collection
  * names reject '$' and NUL and must not start with "system.", and
  * the namespace `db.coll` is capped at 255 bytes. */
final case class MongoSinkConfig(
    uri: String, database: String, collection: String) {
  import MongoSinkConfig._

  require(uri.startsWith("mongodb://") || uri.startsWith("mongodb+srv://"),
    s"MongoDB connection uri must use mongodb:// or mongodb+srv:// — got '$uri'")
  require(database.nonEmpty && !database.exists(BadDbChars),
    s"""invalid database name '$database' (must be non-empty, no / \\ . " $$ space or NUL)""")
  require(collection.nonEmpty && !collection.exists(BadCollChars) &&
    !collection.startsWith("system."),
    s"invalid collection name '$collection' (non-empty, no $$ or NUL, not system.*)")
  require(database.length + 1 + collection.length <= 255,
    s"namespace '$database.$collection' exceeds the 255-byte cap")

  /** Exactly the option keys the MongoDB Spark connector v10 reads. */
  def toOptions: Map[String, String] = Map(
    "connection.uri" -> uri,
    "database" -> database,
    "collection" -> collection)

  /** The connector-backed sink; requires the connector jar on the
    * cluster classpath (not shipped in this sandbox — see scaladoc). */
  def sink: DocumentSink = FormatSink("mongodb", toOptions)
}

object MongoSinkConfig {
  private val BadDbChars: Set[Char] = Set('/', '\\', '.', ' ', '"', '$', '\u0000')
  private val BadCollChars: Set[Char] = Set('$', '\u0000')
}

/** mongoimport-ready Extended-JSON dump — the faithful S3: what the
  * reference piped into `mongoimport`, produced partition-parallel.
  * Fails fast on field names the server would reject. */
object MongoImportSink extends DocumentSink {
  override def write(df: DataFrame, path: String, overwrite: Boolean): Unit = {
    val bad = MongoExtendedJson.invalidFieldNames(df.schema)
    require(bad.isEmpty,
      s"field names MongoDB rejects ('$$'-prefix or dots): ${bad.mkString(", ")}")
    df.select(MongoExtendedJson.toExtendedJsonLine(df).as("value"))
      .write.mode(mode(overwrite)).text(path)
  }
}

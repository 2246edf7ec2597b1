package graft.cdc

import org.apache.spark.sql.types._

/** Schema cloning: StructType → portable DDL, plus schema diffing.
  *
  * The reference extracts Oracle DDL with DBMS_METADATA and regex-strips
  * storage clauses before replaying it on the target
  * (scripts/02_clone_schema_structure.py:21-40). Spark-first, the schema IS
  * the StructType of the source scan, and "adapting storage" means emitting
  * clean ANSI DDL with no physical clauses at all.
  */
object SchemaClone {
  /** ANSI-ish column type for a Spark DataType. */
  def sqlType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType => "INTEGER"
    case LongType                           => "BIGINT"
    case FloatType                          => "REAL"
    case DoubleType                         => "DOUBLE"
    case d: DecimalType                     => s"DECIMAL(${d.precision},${d.scale})"
    case StringType                         => "VARCHAR"
    case BinaryType                         => "BLOB"
    case BooleanType                        => "BOOLEAN"
    case DateType                           => "DATE"
    case TimestampType | TimestampNTZType   => "TIMESTAMP"
    case ArrayType(e, _)                    => s"${sqlType(e)}[]"
    case s: StructType =>
      s.fields.map(f => s"${f.name} ${sqlType(f.dataType)}").mkString("STRUCT(", ", ", ")")
    case MapType(k, v, _)                   => s"MAP(${sqlType(k)}, ${sqlType(v)})"
    case other                              => other.sql
  }

  /** Canonical engine-neutral type token for a Spark DataType — a shared
    * vocabulary both engines can emit (`int64`, `string`, `float32`,
    * `decimal(p,s)`, `timestamp`, `array<t>`), which makes schema output
    * hash-comparable across engines whose DDL spellings differ
    * (VARCHAR/TEXT, BIGINT/INT8, REAL/FLOAT4 all collapse).
    */
  def canonType(dt: DataType): String = dt match {
    case ByteType                           => "int8"
    case ShortType                          => "int16"
    case IntegerType                        => "int32"
    case LongType                           => "int64"
    case FloatType                          => "float32"
    case DoubleType                         => "float64"
    case d: DecimalType                     => s"decimal(${d.precision},${d.scale})"
    case StringType                         => "string"
    case BinaryType                         => "binary"
    case BooleanType                        => "bool"
    case DateType                           => "date"
    case TimestampType | TimestampNTZType   => "timestamp"
    case ArrayType(e, _)                    => s"array<${canonType(e)}>"
    case s: StructType =>
      s.fields.map(f => s"${f.name}:${canonType(f.dataType)}").mkString("struct<", ",", ">")
    case MapType(k, v, _)                   => s"map<${canonType(k)},${canonType(v)}>"
    case other                              => other.simpleString
  }

  /** CREATE TABLE statement for a schema; `ifNotExists` mirrors the
    * reference's skip-existing behavior (:72-75).
    */
  def createTableDdl(table: String, schema: StructType, pk: Seq[String] = Nil,
                     ifNotExists: Boolean = true,
                     stringType: String = "VARCHAR"): String = {
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      val t = f.dataType match {
        // lakehouse engines take bare VARCHAR; RDBMS targets (Derby,
        // Oracle) insist on a length — callers override per dialect
        case StringType => stringType
        case dt => sqlType(dt)
      }
      s"  ${f.name} $t$nn"
    }
    val pkc = if (pk.nonEmpty) Seq(s"  PRIMARY KEY (${pk.mkString(", ")})") else Nil
    s"CREATE TABLE $ine$table (\n${(cols ++ pkc).mkString(",\n")}\n)"
  }

  /** Adapt REAL vendor DDL text (e.g. Oracle `DBMS_METADATA.GET_DDL`
    * output) for replay against a target schema — the reference's
    * `modify_ddl_for_target` (scripts/02_clone_schema_structure.py:22-40):
    * rewrite `"SOURCE"."x"` qualifiers to the target schema and strip the
    * physical-storage clauses so the target's defaults apply. This is the
    * path for cloning tables whose constraints/defaults are not visible
    * through JDBC metadata ([[createTableDdl]] regenerates clean DDL from
    * a StructType and is the path when the schema IS the Spark scan).
    *
    * Clause handling follows Oracle's actual grammar rather than the
    * reference's `KEYWORD\s+\w+` regex for every parameter (which would
    * eat the token after a bare `LOGGING`): PCTFREE/PCTUSED/INITRANS/
    * MAXTRANS take a numeric argument; COMPRESS/NOCOMPRESS/LOGGING/
    * NOLOGGING stand alone.
    */
  def adaptVendorDdl(ddl: String, sourceSchema: String, targetSchema: String): String = {
    val srcQ = java.util.regex.Pattern.quote(sourceSchema.toUpperCase)
    var out = ddl.replaceAll("(?i)\"" + srcQ + "\"\\.\"",
      java.util.regex.Matcher.quoteReplacement(
        "\"" + targetSchema.toUpperCase + "\".\""))
    out = out.replaceAll("""(?i)(\s)TABLESPACE\s+"?\w+"?""", "$1")
    out = out.replaceAll("""(?i)(\s)STORAGE\s*\([^)]+\)""", "$1")
    for (p <- Seq("PCTFREE", "PCTUSED", "INITRANS", "MAXTRANS"))
      out = out.replaceAll(s"""(?i)(\\s)$p\\s+\\d+""", "$1")
    // argumented COMPRESS forms first (COMPRESS FOR OLTP / FOR QUERY HIGH /
    // BASIC / ADVANCED / index COMPRESS 2) so their arguments don't dangle
    out = out.replaceAll(
      """(?i)(\s)COMPRESS\s+(FOR\s+\w+(\s+(HIGH|LOW))?|BASIC|ADVANCED|\d+)""", "$1")
    for (p <- Seq("NOCOMPRESS", "COMPRESS", "NOLOGGING", "LOGGING"))
      out = out.replaceAll(s"""(?i)(\\s)$p(?=\\s|$$|\\))""", "$1")
    out.replaceAll("""(?m)[ \t]+$""", "").replaceAll("""\n{3,}""", "\n\n")
  }

  /** Columns present in source but missing in target → ALTER statements
    * (schema evolution; the incremental analogue of cloning).
    */
  def migrationDdl(table: String, source: StructType, target: StructType): Seq[String] = {
    val have = target.fieldNames.map(_.toLowerCase).toSet
    source.fields.filterNot(f => have(f.name.toLowerCase)).toSeq
      .map(f => s"ALTER TABLE $table ADD COLUMN ${f.name} ${sqlType(f.dataType)}")
  }

  /** Schema drift report between a source and a replica snapshot: per
    * column (case-insensitive match, source order first then
    * target-only), its status — `added` (new at source), `removed`
    * (gone from source), `retyped` (canonical types differ), `ok` —
    * with both canonical types. The detection step in front of
    * [[migrationDdl]]: a replication run alerts on drift it cannot
    * auto-migrate (removed/retyped) and self-heals what it can (added).
    */
  def schemaDiff(source: StructType, target: StructType)
      : Seq[(String, String, String, String)] = {
    val tByName = target.fields.map(f => f.name.toLowerCase -> f).toMap
    val sNames = source.fields.map(_.name.toLowerCase).toSet
    val fromSource = source.fields.toSeq.map { sf =>
      tByName.get(sf.name.toLowerCase) match {
        case None => (sf.name, "added", canonType(sf.dataType), "")
        case Some(tf) =>
          val (cs, ct) = (canonType(sf.dataType), canonType(tf.dataType))
          (sf.name, if (cs == ct) "ok" else "retyped", cs, ct)
      }
    }
    val removed = target.fields.toSeq
      .filterNot(f => sNames(f.name.toLowerCase))
      .map(f => (f.name, "removed", "", canonType(f.dataType)))
    fromSource ++ removed
  }
}

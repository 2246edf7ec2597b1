package graft.cdc

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaCloneSpec extends AnyFunSuite {
  val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("amount", DecimalType(12, 2)),
    StructField("tags", ArrayType(StringType)),
    StructField("ts", TimestampType)))

  test("createTableDdl emits clean ANSI DDL with no storage clauses") {
    val ddl = SchemaClone.createTableDdl("t1", schema, pk = Seq("id"))
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS t1"))
    assert(ddl.contains("id BIGINT NOT NULL"))
    assert(ddl.contains("amount DECIMAL(12,2)"))
    assert(ddl.contains("tags VARCHAR[]"))
    assert(ddl.contains("PRIMARY KEY (id)"))
    assert(!ddl.toUpperCase.contains("TABLESPACE")) // storage stripped by construction
  }

  test("migrationDdl emits ALTERs only for missing columns") {
    val target = StructType(schema.fields.take(2))
    val ddls = SchemaClone.migrationDdl("t1", schema, target)
    assert(ddls.size == 3)
    assert(ddls.head == "ALTER TABLE t1 ADD COLUMN amount DECIMAL(12,2)")
  }

  test("round trip: ddl for every test table type is non-empty") {
    Seq(IntegerType, FloatType, DoubleType, BooleanType, DateType, BinaryType,
      MapType(StringType, LongType)).foreach { dt =>
      assert(SchemaClone.sqlType(dt).nonEmpty)
    }
  }
}

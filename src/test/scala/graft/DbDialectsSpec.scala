package graft

import graft.core._
import java.nio.file.Files
import java.sql.DriverManager

/** Dialect dispatch + rendering for the reference's per-extension ODBC
  * fork (`query_fieldmap.Rmd:139-154`), with the end-to-end `load`
  * path exercised against embedded Derby. */
class DbDialectsSpec extends SparkSuite {

  test("extension dispatch mirrors the reference's driver fork") {
    assert(DbDialects.forDatabaseFile("/data/fieldmap_hei.mdb") === AccessDialect)
    assert(DbDialects.forDatabaseFile("/data/fieldmap_2022.accdb") === AccessDialect)
    assert(DbDialects.forDatabaseFile("/data/MONITORING.FDB") === FirebirdDialect)
    assert(DbDialects.forDatabaseFile("/tmp/local.db") === DerbyDialect)
    val e = intercept[IllegalArgumentException] {
      DbDialects.forDatabaseFile("/data/notes.txt")
    }
    assert(e.getMessage.contains("no dialect"))
  }

  test("url, credential, quoting and pagination rendering per dialect") {
    assert(AccessDialect.jdbcUrl("/d/f.accdb") === "jdbc:ucanaccess:///d/f.accdb")
    assert(FirebirdDialect.jdbcUrl("/d/m.fdb") === "jdbc:firebirdsql:embedded:/d/m.fdb")
    assert(SqlServerDialect.jdbcUrl("dwh;databaseName=D0010_00_Cydonia")
      === "jdbc:sqlserver://dwh;databaseName=D0010_00_Cydonia")
    // the reference's Firebird connection string carries SYSDBA/masterkey
    assert(FirebirdDialect.connectionProperties("user") === "SYSDBA")
    assert(FirebirdDialect.connectionProperties("password") === "masterkey")
    // Access/SQL Server bracket-quote; Firebird is SQL-standard
    assert(AccessDialect.quoteIdent("Grid_points") === "[Grid_points]")
    assert(SqlServerDialect.quoteIdent("we]ird") === "[we]]ird]")
    assert(FirebirdDialect.quoteIdent("Grid_points") === "\"Grid_points\"")
    // the one syntactic fork in the reference's query variants
    assert(AccessDialect.limitSelect("*", "Grid_points", 5)
      === "SELECT TOP 5 * FROM Grid_points")
    assert(FirebirdDialect.limitSelect("*", "Grid_points", 5)
      === "SELECT * FROM Grid_points ROWS 5")
    assert(DerbyDialect.limitSelect("*", "plots", 5)
      === "SELECT * FROM plots FETCH FIRST 5 ROWS ONLY")
  }

  test("DialectQuerySource loads through the resolved dialect and lowercases columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dialect").toString
    val db = s"$dir/field.db;create=true"
    val conn = DriverManager.getConnection(s"jdbc:derby:$db")
    val st = conn.createStatement()
    st.execute("CREATE TABLE Grid_points (SingleID INT, Habsubt1 VARCHAR(10), Area DOUBLE)")
    st.execute("INSERT INTO Grid_points VALUES (1, '2310', 4.5), (2, '4030', 1.5), (3, '2310', 9.0)")
    st.close(); conn.close()

    // one query template rendered through the dialect's limit syntax;
    // dispatch resolves Derby from the .db extension (no override)
    val src = DialectQuerySource(s"$dir/field.db",
      d => d.limitSelect("SingleID, Habsubt1", "Grid_points", 3))
    val got = src.load(spark)
    // reference lowercases returned names (query_fieldmap.Rmd:156)
    assert(got.columns.toSeq === Seq("singleid", "habsubt1"))
    assert(got.as[(Int, String)].collect().toSet
      === Set((1, "2310"), (2, "4030"), (3, "2310")))
  }
}

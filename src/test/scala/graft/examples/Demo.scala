package graft.examples

import org.apache.spark.sql.SparkSession

import graft.model._
import graft.pgq._
import graft.compiler.GraphTableCompiler
import graft.graph.Algorithms

/** End-to-end sample driver exercising the public API against the driver
  * testdata — what a user of the library would write. Run with:
  * `sbt "Test/runMain graft.examples.Demo"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val resolver = TableResolver.parquetDir(sf)
    val registry = PropertyGraphRegistry.forSession(spark)
    registry.clear()
    val pg = PropertyGraph("trade",
      vertexTables = Seq(
        VertexTable("customer", "Customer", Seq("c_custkey")),
        VertexTable("nation", "Nation", Seq("n_nationkey")),
        VertexTable("region", "Region", Seq("r_regionkey"))),
      edgeTables = Seq(
        EdgeTable("customer", "InNation", Seq("c_custkey"), Seq("c_custkey"),
          "Customer", Seq("c_nationkey"), Seq("n_nationkey"), "Nation"),
        EdgeTable("nation", "InRegion", Seq("n_nationkey"), Seq("n_nationkey"),
          "Nation", Seq("n_regionkey"), Seq("r_regionkey"), "Region")))
    registry.create(spark, pg, resolver)
    println(s"registered graphs: ${registry.list()}")

    // 2-hop MATCH: customer -> nation -> region
    val df = GraphTableCompiler.compile(spark, MatchSpec("trade",
      Seq(PathPattern(None, None, PathMode.Walk, Seq(
        VertexPattern(Some("c"), Some("Customer")),
        EdgePattern(Some("e1"), Some("InNation"), EdgeDirection.Right),
        VertexPattern(Some("n"), Some("Nation")),
        EdgePattern(Some("e2"), Some("InRegion"), EdgeDirection.Right),
        VertexPattern(Some("r"), Some("Region"))))),
      where = Some("r.r_name = 'ASIA'"),
      columns = Seq(ColumnSpec("n.n_name", Some("nation")),
        ColumnSpec("c.c_custkey", Some("custkey")))), pg, resolver)
    val grouped = df.groupBy("nation").count().orderBy("nation")
    grouped.show(30, truncate = false)
    grouped.explain("formatted")

    // algorithm over the nation->region membership graph
    Algorithms.wcc(spark, pg, resolver, "Nation", "InRegion")
      .orderBy("n_nationkey").show(30)

    // text front-end: full SQL/PGQ DDL + GRAPH_TABLE round trip
    val g = graft.Graft(spark, resolver)
    g.sql("""CREATE OR REPLACE PROPERTY GRAPH trade2
      VERTEX TABLES (
        supplier LABEL Supplier,
        nation LABEL Nation2
      )
      EDGE TABLES (
        supplier AS supnat SOURCE KEY (s_suppkey) REFERENCES supplier (s_suppkey)
          DESTINATION KEY (s_nationkey) REFERENCES nation (n_nationkey) LABEL InNation2
      )""")
    g.sql("""GRAPH_TABLE (trade2
        MATCH (s:Supplier)-[e:InNation2]->(n:Nation2)
        WHERE n.n_name = 'NATION_3'
        COLUMNS (s.s_name AS supplier, n.n_name AS nation))""")
      .show(5, truncate = false)

    // GRAPH_TABLE embedded inside ordinary Spark SQL
    g.sqlGraph("""SELECT nation, count(*) AS suppliers FROM GRAPH_TABLE (trade2
        MATCH (s:Supplier)-[e:InNation2]->(n:Nation2)
        COLUMNS (n.n_name AS nation)) t
      GROUP BY nation ORDER BY suppliers DESC LIMIT 3""").show()

    // probe: bad label should raise with suggestion
    try {
      GraphTableCompiler.compile(spark, MatchSpec("trade",
        Seq(PathPattern(None, None, PathMode.Walk,
          Seq(VertexPattern(Some("x"), Some("Customr")))))), pg, resolver)
      println("ERROR: expected failure did not happen")
    } catch {
      case e: GraphAnalysisException => println(s"expected error: ${e.msg}")
    }
    spark.stop()
  }
}

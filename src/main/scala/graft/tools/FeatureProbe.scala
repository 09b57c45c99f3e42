package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for round-15 SQL-surface work. Pass 1 verified VARIANT /
  * recursive CTE / pipe syntax / parse_url (all shipped as oracle ids).
  * Pass 2 probes session variables, EXECUTE IMMEDIATE, SQL UDFs, and SQL
  * scripting in this Spark 4.1.2 build. */
object FeatureProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]").appName("feature-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    def probe(name: String)(body: => Unit): Unit =
      try { body; println(s"PROBE $name: OK") }
      catch { case e: Throwable =>
        println(s"PROBE $name: FAIL ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }

    probe("session_variable") {
      s.sql("DECLARE VARIABLE thresh DOUBLE DEFAULT 2.5")
      s.sql("SET VARIABLE thresh = 3.5")
      val r = s.sql("SELECT thresh * 2 AS x").collect()
      println("  var row: " + r.head)
    }
    probe("execute_immediate") {
      val r = s.sql("EXECUTE IMMEDIATE 'SELECT ? + 1 AS y' USING 41").collect()
      println("  exec row: " + r.head)
    }
    probe("sql_udf_scalar") {
      s.sql("CREATE OR REPLACE TEMPORARY FUNCTION hypot2(a DOUBLE, b DOUBLE) RETURNS DOUBLE RETURN sqrt(a*a + b*b)")
      val r = s.sql("SELECT hypot2(3.0, 4.0) AS h").collect()
      println("  udf row: " + r.head)
    }
    probe("sql_udf_table") {
      s.sql("CREATE OR REPLACE TEMPORARY FUNCTION seqtab(n INT) RETURNS TABLE(i INT) RETURN SELECT explode(sequence(1, n))")
      val r = s.sql("SELECT sum(i) AS total FROM seqtab(10)").collect()
      println("  tvf row: " + r.head)
    }
    probe("sql_scripting") {
      val r = s.sql(
        """BEGIN
             DECLARE total INT DEFAULT 0;
             WHILE total < 10 DO
               SET total = total + 3;
             END WHILE;
             SELECT total AS t;
           END""").collect()
      println("  script row: " + r.head)
    }
    s.stop()
  }
}

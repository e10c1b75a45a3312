package graft.server

import org.apache.spark.sql.SparkSession

/** Run the pgwire front-end for real clients:
  *
  * {{{
  * sbt "runMain graft.server.PgServerMain 5433"
  * psql "host=localhost port=5433 user=graft dbname=graft"
  * graft=> SHOW OPERATORS;
  * graft=> RUN OPERATOR q1_agg USING '/root/testdata/sf0.001' LIMIT 5;
  * }}}
  *
  * Optional second arg = a default warehouse dir registered as peer
  * `data` so `SELECT … FROM data.lineitem` works out of the box.
  */
object PgServerMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(5433)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-pgserver")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.mirror.GraftExtensions)
      .getOrCreate()
    args.lift(1).foreach { dir =>
      spark.sql(s"CREATE PEER data TYPE parquet OPTIONS (path '$dir')")
    }
    val server = new PgServer(spark, bindPort = port).start()
    // scalastyle:off println
    println(s"graft pgwire server listening on port ${server.port}")
    // scalastyle:on println
    Thread.currentThread.join() // serve until killed
  }
}

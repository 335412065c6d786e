package graft.streaming

import org.apache.spark.sql.SparkSession

/** WATERMARK-DDL surface (reference: `CREATE TABLE ... WATERMARK FOR col AS
  * expr`, flink-sql-parser SqlCreateTable.java:56). Spark SQL has no
  * watermark clause, so the DDL maps to: register the streaming source as a
  * temp view with `withWatermark` already applied — downstream `spark.sql`
  * text then queries it exactly like the reference queries a watermarked
  * table.
  */
object GraftDdl {

  /** CREATE [STREAMING] VIEW name AS SELECT * FROM parquet-fixture with
    * WATERMARK FOR tsCol AS tsCol - delay. */
  def createStreamView(spark: SparkSession, dir: String, table: String,
      viewName: String, tsCol: String, delay: String): Unit = {
    StreamingOps.streamTable(spark, dir, table)
      .withWatermark(tsCol, delay)
      .createOrReplaceTempView(viewName)
  }
}

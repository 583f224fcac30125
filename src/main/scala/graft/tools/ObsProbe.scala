package graft.tools
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

// Dev scaffolding: does Observation fire on Dataset.localCheckpoint()?
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 1000).toDF("x").repartition(4)
    val obs = Observation("probe")
    val ck = df.observe(obs, count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("s")).localCheckpoint()
    val m = obs.get
    println(s"OBS_RESULT=${m.get("n")} ${m.get("s")} rows=${ck.count()}")
    spark.stop()
  }
}

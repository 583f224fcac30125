package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scaffolding: candidate-count evidence for the high-threshold banded
  * near-dup (q53) — total pairs vs banded candidate pairs vs caught pairs,
  * and recall vs the exact all-pairs form, per sf dir.
  */
object ProfileBandedNearDup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threshold = if (args.length > 1) args(1).toDouble else 0.9
    val bandBits = if (args.length > 2) args(2).toInt else 8
    val numBands = if (args.length > 3) args(3).toInt else 16
    graft.functions.VectorExpressions.register(spark)
    graft.functions.HyperplaneExpressions.register(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val banded = emb.select(
      col("vec_id").as("id"),
      posexplode(expr(
        s"graft_hyperplane_bands(embedding, $bandBits, $numBands, 64)"))
        .as(Seq("band", "sig")))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val nCand = candidates.count()
    val banded_pairs = graft.ext.Similarity.cosineNearDupPairsBucketed(
      emb, "vec_id", "embedding", threshold, bandBits, numBands).count()
    val exact = graft.ext.Similarity.cosineNearDupPairs(
      emb, "vec_id", "embedding", threshold).count()
    println(s"dir=$dir n=$n totalPairs=${n * (n - 1) / 2} " +
      s"candidates=$nCand (${"%.4f".format(100.0 * nCand / (n * (n - 1) / 2))}%) " +
      s"banded=$banded_pairs exact=$exact recall=${
        if (exact == 0) "n/a" else "%.4f".format(banded_pairs.toDouble / exact)}")
    spark.stop()
  }
}

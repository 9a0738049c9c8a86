package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + sharding — the "materialize the corpus
  * as S randomly-permuted ordered shards" step every training loader
  * consumes (epoch order must be random w.r.t. the corpus but
  * reproducible across reruns and engines). Each row gets
  * (shard, pos): shard = md5-hash(id) mod S, pos = 0-based rank inside
  * the shard in (hash, id) order — together a reproducible random
  * permutation with no RNG state.
  *
  * Scale shape: only (id, hash) pairs cross the one rank shuffle (the
  * payload rejoins by id), and ranking partitions by shard — S
  * independent groups, so parallelism is the shard count the caller
  * already sized for the loader. Compose with [[graft.sources.TarShards]]
  * or a partitioned parquet write for the physical layout.
  */
object Shard {

  def assign(df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val ranked = df.select(col(idCol)).withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("__h").asc, col(idCol).asc)).cast("long") - 1L)
      .select(col(idCol), col("shard"), col("pos"))
    df.join(ranked, Seq(idCol))
  }
}

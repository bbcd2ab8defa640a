package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC interchange for corpus tables — the columnar alternative when
  * the surrounding platform is ORC-native (Hive-lineage warehouses).
  * Same engine-level properties as the parquet paths: column pruning,
  * predicate pushdown into the stripe/row-group indexes (asserted in
  * OrcSpec), partitioned layout for partition pruning.
  *
  * zstd compression: the best size/speed trade both formats support;
  * at 100 TB the storage+IO saving dominates the encode cost.
  */
object Orc {

  def write(df: DataFrame, path: String,
            partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").option("compression", "zstd")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}

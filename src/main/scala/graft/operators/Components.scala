package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A13 — connected components over a pixel/voxel mask + keep-largest
  * (reference Hidden_MarkovModels/brain_segmentation.py:88-92:
  * scipy.ndimage.label then size-argmax, used by skull-strip cleanup).
  *
  * Algorithm: min-label propagation with pointer jumping. Each mask
  * cell starts labeled with its own linear id; every round takes the
  * min over 4-neighbors, then compresses paths by joining labels
  * through themselves (label := label-of-label). Neighbor propagation
  * alone needs O(diameter) rounds; the jumping step makes the chase
  * O(log diameter) — the published MapReduce-CC shape (large/small-star
  * is the same idea), which is what survives on a 1000-executor mask.
  * The driver loop stops when no label changes (or at maxIters, which
  * is a correctness cap, not a heuristic: log2 of any realistic mask
  * diameter is < 64).
  *
  * Everything shuffles on (y, x) or on label ids — never on payloads. */
object Components {

  /** Label every mask cell with its component id (the min linear id in
    * the component). Input: (y, x) mask cells; output: (y, x, component). */
  def label(mask: DataFrame, width: Int, maxIters: Int = 64): DataFrame = {
    val offsets = Seq((-1, 0), (1, 0), (0, -1), (0, 1))
    var labels = mask.select(col("y"), col("x"),
      (col("y") * width + col("x")).cast("long").as("component"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      // neighbor-min propagation (J2-style shifted equality join)
      val shifted = labels.withColumn("o", explode(array(offsets.map { case (dy, dx) =>
          struct(lit(dy).as("dy"), lit(dx).as("dx")) }: _*)))
        .select((col("y") + col("o.dy")).as("y"), (col("x") + col("o.dx")).as("x"),
          col("component").as("nb"))
      val propagated = labels.join(shifted, Seq("y", "x"), "left")
        .groupBy("y", "x", "component")
        .agg(min(col("nb")).as("nb_min"))
        .select(col("y"), col("x"),
          least(col("component"), coalesce(col("nb_min"), col("component"))).as("component"))
      // pointer jumping: component := component's component (path halving;
      // a component id is always a live cell's linear id, so the lookup
      // resolves through that cell's current label)
      val labelOf = propagated
        .select((col("y") * width + col("x")).cast("long").as("id"), col("component").as("parent"))
      val jumped = propagated.join(labelOf.withColumnRenamed("id", "component")
          .withColumnRenamed("parent", "grand"), Seq("component"), "left")
        .select(col("y"), col("x"), coalesce(col("grand"), col("component")).as("component"))
      val next = jumped.localCheckpoint()
      changed = next.join(labels.select(col("y"), col("x"), col("component").as("prev")),
        Seq("y", "x"))
        .filter(col("component") =!= col("prev")).count()
      labels = next
      iter += 1
    }
    labels
  }

  /** Keep-largest-component filter: the reference's size-argmax
    * (`keep the biggest object`). Ties break on the smaller component
    * id (deterministic). */
  def largestComponent(labeled: DataFrame): DataFrame = {
    val sizes = labeled.groupBy("component").agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n").desc, col("component"))
    val top = sizes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("component"), col("n").as("component_size"))
    labeled.join(broadcast(top), Seq("component"))
  }

  /** Oracle-checkable end-to-end: label a planted mask (an 8×6 blob, a
    * 4×4 blob, a bridge chain, two singletons) and keep the largest.
    * The DuckDB oracle recomputes the expected membership from the
    * generating geometry — any CC mislabeling (merge across the gap,
    * split of the blob) changes membership or size and fails the hash. */
  def largestComponentQuery(spark: SparkSession): DataFrame = {
    def rect(y0: Int, y1: Int, x0: Int, x1: Int): DataFrame =
      spark.range(1).select(explode(sequence(lit(y0), lit(y1))).as("y"))
        .withColumn("x", explode(sequence(lit(x0), lit(x1))))
        .select(col("y").cast("int").as("y"), col("x").cast("int").as("x"))
    val mask = rect(2, 9, 3, 8)            // 48 cells — the winner
      .unionByName(rect(20, 23, 20, 23))   // 16 cells
      .unionByName(rect(12, 12, 1, 3))     // bridge arm 1
      .unionByName(rect(13, 14, 3, 3))     // bridge arm 2 (connected via (12,3))
      .unionByName(rect(0, 0, 30, 30))     // singleton
      .unionByName(rect(30, 30, 0, 0))     // singleton
    largestComponent(label(mask, width = 64))
      .select("y", "x", "component", "component_size")
      .orderBy("y", "x")
  }
}

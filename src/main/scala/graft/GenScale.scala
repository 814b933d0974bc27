package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 generator by deterministic 10× upsampling of the driver's sf0.1
  * tables (the harness ships SFs only up to 0.1; VERDICT r8 task 8 asks
  * for measured sf1 rows on the heavy queries). Replica r ∈ 0..9 gets
  * every key domain offset by r·10⁹ (far above any sf0.1 key, so
  * replicas never collide and every foreign key stays consistent);
  * replica 0 is the original data bit-for-bit.
  *
  * Distribution fidelity — the two places naive replication would
  * CHANGE the workload's shape rather than its size:
  *  - `documents.text`: identical text ×10 would multiply every
  *    content-keyed group (exact-dup groups, shingle document
  *    frequencies) by 10 and create ~45 cross-replica near-dup pairs
  *    per document — a quadratic distortion, not a scale-up. Replica
  *    r > 0 suffixes every 5th token with `_r<r>`: within-replica
  *    similarity structure is preserved (both members of a planted
  *    near-dup pair get the same positional transformation), while
  *    cross-replica Jaccard drops to ≈ (1−0.2·3)·orig < any dedup
  *    threshold (each changed token kills its 3 covering trigram
  *    shingles).
  *  - `embeddings.embedding`: dimension 0 gets +r·10⁻³ so replicas are
  *    not exact-duplicate vectors (which would make every kNN list
  *    degenerate); 10⁻³ ≪ inter-point distances, so cluster geometry
  *    is intact.
  * Everything else (prices, dates, statuses, graph structure per
  * replica) is untouched: sf1 = ten disjoint sf0.1 worlds sharing the
  * 25/5 nation/region dims — the same shape TPC-H scaling itself
  * produces (dims fixed, facts linear).
  *
  * Usage: `runMain graft.GenScale [outDir] [replicas] [tables]` (defaults
  * target/sf1, 10, all). Writes one parquet per table; the optional
  * comma-separated table list restricts the run — a third-decade probe
  * (sf100 = 1000 replicas) needs only the one or two tables its target
  * queries read, not 600 M lineitem rows.
  */
object GenScale {
  val Offset = 1000000000L

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/sf1")
    val replicas = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val onlyTables: Set[String] = args.drop(2).headOption
      .map(_.split(",").toSet).getOrElse(Set.empty)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame, keyCols: Seq[String],
                  perturb: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until replicas).map { r =>
        val off = keyCols.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(r * Offset)))
        perturb(off, r)
      }.reduce(_ unionByName _)

    def write(name: String, df: => DataFrame): Unit =
      if (onlyTables.nonEmpty && !onlyTables(name)) ()
      else {
        df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
        println(s"[gen] $name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
      }

    val read = (n: String) => spark.read.parquet(s"$srcDir/$n.parquet")

    // fixed dims: ship as-is (TPC-H keeps them constant across SFs)
    Seq("region", "nation").foreach(n => write(n, read(n)))

    write("customer", replicate(read("customer"), Seq("c_custkey")))
    write("supplier", replicate(read("supplier"), Seq("s_suppkey")))
    write("part", replicate(read("part"), Seq("p_partkey")))
    write("orders", replicate(read("orders"), Seq("o_orderkey", "o_custkey")))
    write("lineitem", replicate(read("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey")))
    write("events", replicate(read("events"), Seq("event_id", "user_id")))

    write("documents", replicate(read("documents"), Seq("doc_id"),
      perturb = (d, r) =>
        if (r == 0) d
        else d.withColumn("text", concat_ws(" ",
          transform(split(col("text"), " "),
            (t, i) => when(i % 5 === 4, concat(t, lit(s"_r$r"))).otherwise(t))))
          // source invariant (verified): n_chars == length(text)
          .withColumn("n_chars", length(col("text")).cast("long"))))

    // Perturbation spread over dims 0/1 so a THIRD-decade run (1000
    // replicas) stays ≤ 0.031 per dim — r·0.001 on one dim reaches ~1.0
    // at r=999, which is no longer ≪ inter-point distance and would
    // reshape cluster geometry instead of replicating it. (r%32, r/32)
    // is unique per replica for r < 1024; the dim-1 branch is only
    // EMITTED when r ≥ 32 (r/32 > 0), so for r < 32 the plan is
    // literally the old single-dim expression — `x + 0.0f` would
    // otherwise canonicalize a -0.0f component to +0.0f and break the
    // bit-identity claim for sf1/sf10 regeneration.
    //
    // SPARK_GRAFT_EMB_SEP=1 (r12): ROTATION-SEPARATED replicas for
    // threshold-dedup probe corpora. The tiny dim-0/1 shift keeps
    // cross-replica cosines ≈ 0.999 — ABOVE any dedup threshold — so
    // every base vector becomes a #replicas-sized near-dup atom and the
    // true answer of a 0.9-threshold pair query grows QUADRATICALLY
    // with the replica count (answer growth, not work growth — the
    // q_record_linkage adjudication class). With separation on, each
    // replica r > 0 applies a replica-specific signed coordinate
    // rotation (cyclic shift by r mod 64 + a 4-bit sign pattern from
    // r div 64 — 1024 distinct hyperoctahedral rotations): every
    // intra-replica inner product is EXACTLY preserved (the dedup/kNN
    // structure of each world is byte-faithful up to cell labels).
    // Cross-replica separation is shift-driven: DIFFERENT shifts mix
    // residue classes and collapse cosines to ~0; SAME-shift replicas
    // (r ≡ r' mod 64, sign patterns differing in b bits) have cosine
    // 1 − 2·(energy in the b flipped residue classes) ≈ 1 − b/2 in
    // expectation — worst case ≈ 0.5 at b = 1, which sits below the
    // 0.9-class dedup thresholds this mode exists for but NOT below an
    // arbitrary one; skewed per-class energy could push such a pair
    // back above a low threshold. Validity bounds enforced below:
    // embeddings must be 64-dim (the rotation hardcodes the modulus)
    // and replicas < 1024 (replica 1024 would be the identity rotation,
    // colliding with the base world). Probe dirs only; default off
    // keeps the standard corpora byte-identical.
    val sep = sys.env.get("SPARK_GRAFT_EMB_SEP").contains("1")
    if (sep) {
      require(replicas < 1024,
        s"EMB_SEP supports < 1024 replicas (got $replicas): rotation 1024 " +
          "is the identity and would collide with replica 0")
      // coalesce(size(...), -1): a null embedding row must surface in
      // the require MESSAGE as length -1, not as an NPE from getInt on
      // a null cell (r14, ADVICE)
      val embLen = read("embeddings")
        .select(coalesce(size(col("embedding")), lit(-1)).as("len"))
        .distinct().collect().map(_.getInt(0))
      require(embLen.sameElements(Array(64)),
        s"EMB_SEP rotation assumes 64-dim embeddings, found lengths " +
          embLen.mkString("{", ",", "}") + " (-1 = null embedding)")
    }
    write("embeddings", replicate(read("embeddings"), Seq("vec_id"),
      perturb = (d, r) =>
        if (r == 0) d
        else if (!sep) d.withColumn("embedding",
          transform(col("embedding"), (x, i) => {
            val dim0 = when(i === 0, x + lit((r % 32) * 0.001f))
            if (r / 32 == 0) dim0.otherwise(x)
            else dim0.when(i === 1, x + lit((r / 32) * 0.001f)).otherwise(x)
          }))
        else {
          val shift = r % 64
          val k = r / 64
          val sgn = (0 until 4).map(bit => if (((k >> bit) & 1) == 1) -1f else 1f)
          d.withColumn("embedding",
            transform(col("embedding"), (_, i) =>
              when(i % 4 === 0, lit(sgn(0))).when(i % 4 === 1, lit(sgn(1)))
                .when(i % 4 === 2, lit(sgn(2))).otherwise(lit(sgn(3))) *
                element_at(col("embedding"), ((i + lit(shift)) % 64) + 1)))
        }))

    spark.stop()
  }
}

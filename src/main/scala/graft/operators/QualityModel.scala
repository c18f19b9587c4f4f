package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: a logistic-regression classifier over
  * hashed bag-of-words features, trained inside the engine by
  * full-batch gradient descent and applied as a map-only scorer.
  *
  * This is the public GPT-3/fastText-shaped quality classifier (a
  * linear model over hashed n-gram features; Brown et al. 2020 §A.2
  * describe filtering CommonCrawl with exactly such a classifier) —
  * an engine extension beyond the reference's operator list.
  *
  * Scale shape (r14 fused form):
  *  - the hashed feature matrix (doc, bucket, x = n_b/|d|) is built in
  *    ONE corpus pass, grouped into per-doc (b, x) arrays (bounded by
  *    min(B, |d|) entries), label-joined, and pinned ONCE (at a real
  *    100 TB run you would persist that grouped form to storage once);
  *  - model state is O(B) (B = hash buckets, a constant like 512): the
  *    weight vector lives on the driver and rides back into each
  *    iteration as an O(B) dense plan LITERAL — the classic
  *    "parameters small, data huge" distributed-GD layout; each
  *    iteration is one MAP-ONLY scan (score fold + delta + exploded
  *    gradient terms in one Project) plus one bucket-keyed aggregate
  *    returning B+1 rows — zero doc-keyed shuffles per iteration
  *    (the broadcast-join/delta-join shape this replaces degrades to a
  *    full feature-matrix shuffle per iteration once delta outgrows
  *    the broadcast limit; A/B in BASELINE.md);
  *  - inference is feature-build + one broadcast join + one doc-keyed
  *    sum (classify), or zero joins via the scoreInline map-only
  *    column: no corpus-sized state anywhere.
  *
  * Determinism firewall: per-doc scores and updated weights are rounded
  * to 9 decimals EVERY iteration, so an external engine replaying the
  * same arithmetic (DuckDB in the oracle) cannot drift — float
  * association noise (~1e-13) is quantized away before it can compound
  * across iterations.
  */
object QualityModel {

  private def fold(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** Hashed normalized bag-of-words: (doc_id, b, x) with
    * x = count(tokens in bucket b) / |d|. One corpus scan — the
    * [[graft.functions.WordBagFeatures]] kernel counts buckets
    * row-locally in a single digest pass (r16; the exploded
    * shingle_hashes stream + per-doc hash-aggregate exchange it
    * replaces is kept as [[hashedFeaturesExpr]] for the differential
    * spec — bit-identical (b, x) rows, CharGramFeaturesSpec). */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.WordBagFeatures(col(textCol), buckets)).as("e"))
      .select(col("doc_id"), col("e.b").as("b"), col("e.x").as("x"))

  /** Pre-kernel expression formulation of [[hashedFeatures]] — the
    * differential reference only. */
  private[graft] def hashedFeaturesExpr(docs: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.ShingleHashes(col(textCol), 1, 7, dedup = false).as("__hs"))
      .select(col("doc_id"), size(col("__hs")).cast("double").as("__dl"),
        explode(col("__hs")).as("__t"))
      .select(col("doc_id"), col("__dl"), (col("__t") % buckets).as("b"))
      .groupBy("doc_id", "__dl", "b")
      .agg(count(lit(1)).as("__n"))
      .select(col("doc_id"), col("b"), (col("__n") / col("__dl")).as("x"))

  /** Hashed normalized bag of CHARACTER n-grams: (doc_id, b, x) with
    * x = count(grams in bucket b) / total grams in the doc — fastText's
    * actual subword representation (Joulin et al. 2016; Bojanowski et
    * al. 2017 §3.2 use boundary-marked char n-grams exactly like the
    * `<w>` marking here). Word-unigram features carry zero signal on
    * vocabulary unseen in training and none at all for scripts without
    * whitespace; char n-grams generalize through shared morphology.
    * One corpus scan, map-only until the (doc, bucket) aggregate; gram
    * hashing is the same md5 7-hex fold the oracle replays. */
  def hashedCharFeatures(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int, n: Int = 3): DataFrame = {
    require(n >= 2, s"hashedCharFeatures: n must be >= 2, got $n")
    docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.CharGramFeatures(col(textCol), n, buckets))
          .as("e"))
      .select(col("doc_id"), col("e.b").as("b"), col("e.x").as("x"))
  }

  /** The pre-kernel expression formulation of [[hashedCharFeatures]]
    * (explode the marked-gram stream, fold each gram's md5, aggregate
    * per (doc, bucket)) — kept ONLY as the differential reference the
    * kernel is pinned against (CharGramFeaturesSpec: bit-identical
    * (b, x) rows on real + adversarial text). The kernel replaces the
    * (doc, gram) explode AND its per-doc hash-aggregate exchange with
    * one row-local digest pass. */
  private[graft] def hashedCharFeaturesExpr(docs: DataFrame, idCol: String,
      textCol: String, buckets: Int, n: Int = 3): DataFrame = {
    require(n >= 2, s"hashedCharFeaturesExpr: n must be >= 2, got $n")
    val grams = flatten(transform(
      filter(split(col(textCol), " "), w => length(w) > 0), w => {
        val m = concat(lit("<"), w, lit(">"))
        // |m| >= 3 for a non-empty word, so the sequence never
        // descends for n = 3; shorter marked words at larger n yield
        // their single truncated window via the greatest() guard
        transform(sequence(lit(1), greatest(length(m) - (n - 1), lit(1))),
          i => m.substr(i, lit(n)))
      }))
    docs
      .select(col(idCol).as("doc_id"), grams.as("__gs"))
      .select(col("doc_id"), size(col("__gs")).cast("double").as("__dl"),
        explode(col("__gs")).as("__g"))
      .select(col("doc_id"), col("__dl"),
        (fold(col("__g")) % buckets).as("b"))
      .groupBy("doc_id", "__dl", "b")
      .agg(count(lit(1)).as("__n"))
      .select(col("doc_id"), col("b"), (col("__n") / col("__dl")).as("x"))
  }

  /** Trained model: sparse weights over hash buckets + bias. */
  final case class Model(weights: Map[Long, Double], bias: Double, buckets: Int)

  /** Per-doc SORTED (b, x) feature arrays, label-joined (LEFT, so every
    * label row survives) and pinned via a lazy local checkpoint — the
    * one grouped frame that serves BOTH training and scoring, so the
    * expensive group-by-doc runs once per pipeline instead of once per
    * consumer. One `count()` on the result both materializes the
    * checkpoint and returns the exact label count (the trainers' N) —
    * folding the r14 separate labels-count job into the pin. Docs with
    * no feature rows carry a null `fx`: the gradient scans filter them
    * (preserving the inner-join gradient semantics the oracle
    * replays), while scorers can still see them and emit null.
    * sort_array canonicalizes the score-fold summation order (r14
    * advice: reassociation was previously only *rounded* away; now the
    * order itself is deterministic across runs and partitionings). */
  def pinLabeledFeatures(feats: DataFrame, labels: DataFrame): DataFrame =
    labels.join(
      feats.groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("b"), col("x")))).as("fx")),
      Seq("doc_id"), "left")
      .localCheckpoint(false)

  /** [[pinLabeledFeatures]] for char-n-gram features built DIRECTLY from
    * the [[graft.functions.CharGramFeatures]] kernel: the kernel already
    * emits each document's sparse (b, x) pairs sorted by bucket — which
    * IS the `sort_array(collect_list(struct(b, x)))` array the grouped
    * pin produces (b is unique per doc, so b-order equals struct order)
    * — so the per-doc feature array costs one map-only projection
    * instead of an exploded gram stream plus a doc-keyed group-by
    * exchange. Empty feature arrays (no non-empty words) map to null fx,
    * preserving the left-join contract: gradient scans filter them,
    * scorers emit null. Bit-identical to
    * `pinLabeledFeatures(hashedCharFeatures(..), labels)`
    * (CharGramFeaturesSpec pins the equality). */
  def pinLabeledCharFeatures(docs: DataFrame, idCol: String, textCol: String,
      labels: DataFrame, buckets: Int, n: Int = 3): DataFrame =
    labels.join(
      docs.select(col(idCol).as("doc_id"),
        graft.functions.CharGramFeatures(col(textCol), n, buckets).as("__fx"))
        .select(col("doc_id"),
          when(size(col("__fx")) > 0, col("__fx")).as("fx")),
      Seq("doc_id"), "left")
      .localCheckpoint(false)

  /** [[pinLabeledFeatures]] for bag-of-WORD features built directly
    * from the [[graft.functions.WordBagFeatures]] kernel — the word
    * twin of [[pinLabeledCharFeatures]], same contract (sorted fx,
    * null on no features — unreachable for word features, which hash
    * even the empty token, but kept for shape parity). */
  def pinLabeledWordFeatures(docs: DataFrame, idCol: String, textCol: String,
      labels: DataFrame, buckets: Int): DataFrame =
    labels.join(
      docs.select(col(idCol).as("doc_id"),
        graft.functions.WordBagFeatures(col(textCol), buckets).as("__fx"))
        .select(col("doc_id"),
          when(size(col("__fx")) > 0, col("__fx")).as("fx")),
      Seq("doc_id"), "left")
      .localCheckpoint(false)

  /** Full-batch gradient descent for logistic regression:
    * w ← round(w − lr·∇, 9) per iteration, ∇_b = Σ_d (σ(s_d) − y_d)·x_db / N.
    * `labels` is (doc_id, y ∈ {0,1}). Weights start at zero (so the
    * first iteration's σ(0) = 0.5 exactly, replayable anywhere). */
  def trainLogReg(spark: SparkSession, feats: DataFrame, labels: DataFrame,
      buckets: Int, iters: Int = 3, lr: Double = 1.0): Model = {
    val lab = labels.select(col("doc_id"), col("y").cast("double").as("y"))
    val pinned0 = pinLabeledFeatures(feats, lab)
    trainLogRegPinned(pinned0, pinned0.count().toDouble, buckets, iters, lr)
  }

  /** [[trainLogReg]] over a pre-built (doc_id, y, fx) pin whose count
    * the caller already took — the binary twin of
    * [[trainLogRegMultiPinned]]: one grouped checkpoint serves
    * training AND [[classifyPinned]] scoring, so the feature kernel
    * runs once per pipeline instead of once per consumer. */
  def trainLogRegPinned(pinned0: DataFrame, n: Double,
      buckets: Int, iters: Int = 3, lr: Double = 1.0): Model = {
    // Fused GD step (r14): the feature matrix is grouped into per-doc
    // (b, x) arrays ONCE (bounded: ≤ min(B, |d|) entries per doc) and
    // labels joined once; each iteration is then a SINGLE scan — the
    // per-doc score is a fold over the array against the weight vector
    // riding as an O(B) dense plan literal (the k-means-centroid /
    // PQ-codebook pattern), delta multiplies the exploded (b, x) rows
    // in the same Project, and one bucket-keyed exchange returns the
    // (B+1)-row gradient (bias as virtual bucket −1 with x = 1). The
    // r13 shape paid two feature-matrix scans and three exchanges per
    // iteration (doc-keyed score agg, label join, bucket agg); this
    // pays zero doc-keyed exchanges after the one-off grouping.
    // Sorted arrays make the score-fold summation order canonical; the
    // 9-decimal quantization remains the cross-engine firewall for the
    // oracle's own (hash-aggregated, orderless) replay of the same sum.
    val pinned = pinned0.filter(col("fx").isNotNull)
    var w = Map.empty[Long, Double]
    var bias = 0.0
    for (_ <- 0 until iters) {
      // graft_feature_dot: the codegen'd sparse·dense inner product —
      // same elements, same left-to-right order as the interpreted
      // aggregate() fold it replaces (bit-identical sum; r15 A/B in
      // BASELINE), weights baked into the generated code as one
      // double[] reference.
      val s = round(
        graft.functions.FeatureDot(col("fx"),
          (0 until buckets).map(b => w.getOrElse(b.toLong, 0.0))) +
          lit(bias), 9)
      val grads = pinned
        .select((lit(1.0) / (lit(1.0) + exp(-s)) - col("y")).as("d"),
          explode(concat(col("fx"),
            array(struct(lit(-1L).as("b"), lit(1.0).as("x"))))).as("e"))
        .groupBy(col("e.b").as("b"))
        .agg(sum(col("e.x") * col("d")).as("g"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      w = (grads - (-1L)).map { case (b, g) =>
        b -> BigDecimal(w.getOrElse(b, 0.0) - lr * g / n)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      bias = BigDecimal(bias - lr * grads(-1L) / n)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Model(w, bias, buckets)
  }

  /** One-vs-rest multiclass logistic regression, all classes fused
    * into the SAME per-iteration pass as [[trainLogReg]]: the per-doc
    * feature arrays are grouped and checkpointed ONCE, and each GD
    * iteration is one map-only scan computing K score folds + K deltas
    * in a single Project, then ONE bucket-keyed exchange carrying K
    * gradient sums per bucket — cost per iteration is independent of K
    * in exchanges and scans (the fastText/GPT-3-style lang-ID or
    * domain-classifier layout, where K is small and the corpus is the
    * 100 TB object). `labels` is (doc_id, label: String); one binary
    * model per entry of `classes` (label == c). Same 9-decimal
    * quantization firewall per class as the binary trainer. */
  def trainLogRegMulti(spark: SparkSession, feats: DataFrame,
      labels: DataFrame, classes: Seq[String], buckets: Int,
      iters: Int = 3, lr: Double = 1.0): Map[String, Model] = {
    require(classes.nonEmpty && classes.distinct.size == classes.size,
      s"classes must be distinct and non-empty: $classes") // before any job runs
    val pinned = pinLabeledFeatures(feats,
      labels.select(col("doc_id"), col("label")))
    trainLogRegMultiPinned(pinned, pinned.count().toDouble, classes,
      buckets, iters, lr)
  }

  /** [[trainLogRegMulti]] over a pre-built [[pinLabeledFeatures]] pin
    * whose count the caller already took: lets one grouped checkpoint
    * serve training AND [[scoreMultiPinned]] scoring (the
    * q_lang_id_trained shape — at 100 TB the grouped feature form is
    * written to storage once and every consumer reads it). */
  def trainLogRegMultiPinned(pinned0: DataFrame, n: Double,
      classes: Seq[String], buckets: Int,
      iters: Int = 3, lr: Double = 1.0): Map[String, Model] = {
    require(classes.nonEmpty && classes.distinct.size == classes.size,
      s"classes must be distinct and non-empty: $classes")
    val k = classes.size
    val pinned = pinned0.filter(col("fx").isNotNull)
    val ws = Array.fill(k)(Map.empty[Long, Double])
    val biases = Array.fill(k)(0.0)
    for (_ <- 0 until iters) {
      // K deltas in one Project; the exploded (b, x) rows then feed K
      // gradient sums in one aggregate — one scan, one exchange total
      val deltaCols = classes.zipWithIndex.map { case (c, ci) =>
        val s = round(
          graft.functions.FeatureDot(col("fx"),
            (0 until buckets).map(b => ws(ci).getOrElse(b.toLong, 0.0))) +
            lit(biases(ci)), 9)
        (lit(1.0) / (lit(1.0) + exp(-s)) -
          (col("label") === c).cast("double")).as(s"__d$ci")
      }
      val grads = pinned
        .select((deltaCols :+
          explode(concat(col("fx"),
            array(struct(lit(-1L).as("b"), lit(1.0).as("x"))))).as("e")): _*)
        .groupBy(col("e.b").as("b"))
        .agg(classes.indices.map(ci =>
          sum(col("e.x") * col(s"__d$ci")).as(s"__g$ci")).head,
          classes.indices.tail.map(ci =>
            sum(col("e.x") * col(s"__d$ci")).as(s"__g$ci")): _*)
        .collect()
        .map(r => r.getLong(0) -> classes.indices.map(ci =>
          r.getDouble(1 + ci)).toArray).toMap
      classes.indices.foreach { ci =>
        ws(ci) = (grads - (-1L)).map { case (b, g) =>
          b -> BigDecimal(ws(ci).getOrElse(b, 0.0) - lr * g(ci) / n)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        biases(ci) = BigDecimal(biases(ci) - lr * grads(-1L)(ci) / n)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    classes.zipWithIndex.map { case (c, ci) =>
      c -> Model(ws(ci), biases(ci), buckets)
    }.toMap
  }

  /** Map-only multi-model scoring over a [[pinLabeledFeatures]] pin:
    * one score fold per model against the already-grouped (and
    * checkpointed) feature arrays — no feature rebuild, no tokenizer
    * kernel re-run, no joins, no shuffle. Each class c contributes
    * `s_c = round(sigma(round(Σ x·w + bias, 9)), scale)`, the same
    * expression (and the same sorted fold order) the trainer scores
    * with. Docs with null fx (no features) score null — [[classify]]
    * emits no row for them, so the paths agree on "no score". Output:
    * every non-fx pinned column + one s_<class> per model. */
  def scoreMultiPinned(pinned: DataFrame, models: Seq[(String, Model)],
      scale: Int = 6): DataFrame = {
    val scoreCols = models.map { case (name, m) =>
      val s = round(
        graft.functions.FeatureDot(col("fx"),
          (0 until m.buckets).map(b => m.weights.getOrElse(b.toLong, 0.0))) +
          lit(m.bias), 9)
      round(lit(1.0) / (lit(1.0) + exp(-s)), scale).as(s"s_$name")
    }
    pinned.select(pinned.columns.filterNot(_ == "fx").map(col).toSeq
      ++ scoreCols: _*)
  }

  /** [[classify]] over a pre-built (doc_id, …, fx) pin: one codegen'd
    * graft_feature_dot pass per row, weights as plan literals — no
    * join, no doc-keyed aggregate, and the feature kernel is never
    * re-run (the pin was materialized once for training). Same score
    * arithmetic as classify (s = round9(w·x + bias) — FeatureDot's
    * sorted-array sum vs the join-form's orderless sum land on the same
    * 9-decimal value, the standing GD firewall); feature-less (null fx)
    * docs emit no row, matching classify's inner-join semantics. */
  def classifyPinned(pinned: DataFrame, model: Model): DataFrame = {
    val s = round(
      graft.functions.FeatureDot(col("fx"),
        (0 until model.buckets).map(b => model.weights.getOrElse(b.toLong, 0.0))) +
        lit(model.bias), 9)
    pinned.filter(col("fx").isNotNull)
      .select(col("doc_id"),
        (lit(1.0) / (lit(1.0) + exp(-s))).as("quality"))
  }

  /** Map-only scoring: (doc_id, quality = sigma(w·x + bias)). */
  def classify(spark: SparkSession, feats: DataFrame, model: Model): DataFrame = {
    val wDf = spark.createDataFrame(model.weights.toSeq).toDF("b", "w")
    feats.join(broadcast(wDf), Seq("b"), "left")
      .groupBy("doc_id")
      .agg(round(sum(col("x") * coalesce(col("w"), lit(0.0))) + lit(model.bias), 9)
        .as("s"))
      .select(col("doc_id"),
        (lit(1.0) / (lit(1.0) + exp(-col("s")))).as("quality"))
  }

  /** Reliability (calibration) report for a probability scorer: rows
    * bucketed by predicted probability into `buckets` equi-width bins,
    * each reporting its size, the OBSERVED positive fraction, the bin
    * midpoint, and the gap — the standard reliability-diagram table
    * (Niculescu-Mizil & Caruana 2005) that decides whether a quality
    * classifier's scores can be thresholded as probabilities.
    *
    * One equi-join + one partial-agg groupBy over `buckets` groups.
    * Deliberately reports the bin MIDPOINT rather than the mean
    * predicted probability: every output is then integer-exact
    * arithmetic (counts and one division each) — no float-sum
    * association, so any engine replays it bit-for-bit.
    *
    * Output: (bucket, n, frac_pos, midpoint, gap). */
  def calibration(scored: DataFrame, labels: DataFrame,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    scored.join(labels.select(col("doc_id"), col("y").cast("double").as("y")),
        Seq("doc_id"))
      .withColumn("bucket",
        least(floor(col("quality") * buckets), lit(buckets - 1)).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") > 0.5, 1L).otherwise(0L)).as("__pos"))
      .select(col("bucket"), col("n"),
        (col("__pos").cast("double") / col("n").cast("double")).as("frac_pos"),
        ((col("bucket").cast("double") + lit(0.5)) / buckets).as("midpoint"))
      .withColumn("gap", abs(col("frac_pos") - col("midpoint")))
  }

  /** Map-only scoring COLUMN: the weight vector rides along as a dense
    * plan literal (O(B)) and the score is one codegen'd
    * [[graft.functions.HashBucketDot]] pass over the token-hash
    * array — no explode, no shuffle, no state. This is the
    * streaming-safe form (stateless per-row projection) and the
    * cheapest batch form; it equals [[classify]] up to float
    * association order (Σ_t w[b(t)]/|d| vs Σ_b n_b·w_b/|d|), which the
    * same 9-decimal quantization absorbs. (r15: the kernel replaced an
    * interpreted fold over a sparse map literal — same element order,
    * bit-identical sums; A/B in BASELINE.) */
  def scoreInline(textCol: Column, model: Model): Column = {
    val hs = graft.functions.ShingleHashes(textCol, 1, 7, dedup = false)
    val s = round(
      graft.functions.HashBucketDot(hs, (0 until model.buckets).map(b =>
        model.weights.getOrElse(b.toLong, 0.0))) /
        size(hs).cast("double") + lit(model.bias), 9)
    // zero-token doc → 0.0/0 = NaN score; surface it as null (classify
    // emits no row for a feature-less doc, so the paths agree on "no
    // score"). nanvl keeps this to the existing two kernel references —
    // a when(size(hs) > 0, …) guard would evaluate the interpreted-HOF
    // kernel a third time (the r14 re-evaluation trap).
    nanvl(lit(1.0) / (lit(1.0) + exp(-s)), lit(null).cast("double"))
  }
}

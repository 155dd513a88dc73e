package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.engine.{QueryDef, QueryGroup, Tables}

/** SimHash near-duplicate detection — the second LLM-corpus dedup
  * family (north star): a 64-bit locality-sensitive fingerprint whose
  * Hamming distance tracks cosine/Jaccard similarity of the shingle
  * multiset.
  *
  * Shares [[NearDup.shingleRows]] (word 3-gram shingles) so the two
  * dedup families are directly comparable. Like NearDup this is a
  * banded-candidate design: 4 bands of 16 bits; two docs within
  * Hamming distance k < 4·... share at least one full band far more
  * often than random pairs (pigeonhole: distance ≤ 3 GUARANTEES a
  * shared band), so candidates come from equi-joins, never all-pairs.
  *
  * The fingerprint is xxhash64 over a data-dependent vocabulary, so —
  * unlike AnnIvf's constant hyperplanes — no literal-embedding trick
  * makes it DuckDB-reproducible. The declared query therefore emits
  * INVARIANT VERDICTS the oracle states as constants (the sketch
  * pattern, SURVEY §2.0): precision (every simhash pair is an exact
  * shingle-Jaccard ≥ 0.5 pair) and recall ≥ 0.4 against that exact
  * ground truth, whose pair count the oracle recomputes independently.
  * A fingerprint/banding regression flips a boolean and fails the
  * driver hash. SimHashSpec keeps the raw-pair behavior (hamming
  * soundness, planted pairs, identity) as targeted tests.
  */
object SimHash extends QueryGroup {

  val Bits = 64
  val Bands = 4
  val BandBits: Int = Bits / Bands // 16

  /** (doc_id, simhash) — one 2-phase aggregation: per shingle row, each
    * bit of xxhash64 votes ±1; the sign of each bit's sum becomes the
    * fingerprint bit. All 64 vote sums are codegen'd scalar aggregates
    * with map-side partials (same shape as NearDup.minhashSignature). */
  def simhash(shRows: DataFrame): DataFrame = {
    // materialize the hash as a child-projection attribute: referencing
    // xxhash64(sh) directly in all 64 vote expressions would re-inline
    // (and recompute) it 64× per row
    val hashed = shRows.withColumn("h", xxhash64(col("sh")))
    val votes = (0 until Bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$b")
    }
    val fp = (0 until Bits).map { b =>
      (col(s"b$b") > 0).cast("long") * lit(1L << b)
    }.reduce(_ + _) // disjoint bits: sum == bitwise OR
    hashed
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  /** Pairs within Hamming distance maxHamming, via band-collision
    * candidates. Distance ≤ 3 is guaranteed detected (pigeonhole over
    * 4 bands); larger distances are detected iff an undamaged band
    * survives — the standard recall/cost dial. */
  def nearPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sig = simhash(NearDup.shingleRows(docs))
    val banded = sig.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until Bands).map { j =>
        struct(lit(j).as("band"),
          shiftright(col("simhash"), j * BandBits)
            .bitwiseAND(lit((1L << BandBits) - 1)).as("v"))
      }: _*)).as("bk"))
    // bucket-collect pair expansion (NearDup.bucketPairs rationale):
    // the signature pipeline is aggregated once, and each collected
    // element carries (doc_id, simhash) so the hamming verify needs no
    // re-join against sig
    val ids = col("ids")
    val pairs = flatten(transform(
      sequence(lit(1), size(ids) - 1),
      i => transform(slice(ids, i + 1, size(ids)),
        y => struct(
          element_at(ids, i).getField("doc_id").as("id1"),
          element_at(ids, i).getField("simhash").as("s1"),
          y.getField("doc_id").as("id2"),
          y.getField("simhash").as("s2")))))
    banded
      .groupBy("bk")
      .agg(array_sort(collect_set(struct(col("doc_id"), col("simhash")))).as("ids"))
      // NearDup.MaxBucketDocs rationale: a 16-bit band value shared by
      // thousands of docs is a corpus-common pattern whose in-bucket
      // expansion is quadratic (and here a single giant array row);
      // true near-dups still collide in their other, discriminative
      // bands. No bucket reaches the cap at the oracle scales, so the
      // declared output is unchanged by it.
      .filter(size(ids) > 1 && size(ids) <= NearDup.MaxBucketDocs)
      .select(explode(pairs).as("p"))
      .select(col("p.id1"), col("p.id2"),
        expr("bit_count(p.s1 ^ p.s2)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  def defs: Seq[QueryDef] = Seq(
    // Ledger-drift adjudication (r8, the 014b6a3 house procedure):
    // the r7 in-ledger move 2.11 -> 2.40 s A/B'd against the r6 tree
    // in one session, interleaved BenchOne warm runs at sf0.1 —
    // r6 tree {2.51, 2.36, 2.67, 2.65} vs current {2.65, 2.49}:
    // identical within noise, both above the r6-verdict reading on a
    // box running ~15-25% slow across unchanged siblings that
    // session. SimHash.scala is byte-unchanged since r6 (git diff).
    // Verdict: box drift, not a regression; no fix warranted.
    QueryDef(
      "simhash_near",
      (spark, sf) => {
        val docs = Tables.documents(spark, sf)
        val found = nearPairs(docs, 3).select("id1", "id2")
        val truth = NearDup.corpusPairs(spark, sf).select("id1", "id2")
        // ONE full-outer join + one aggregation carries all three
        // verdict ingredients (truth count, hits, found-only junk).
        // A recall join plus a precision anti-join would reference the
        // truth and found pipelines twice each — locally that's saved
        // by ReuseExchange (measured: equal runtime), but the single-
        // pass shape doesn't depend on that optimization surviving
        // AQE re-planning at scale. The ~3 s cost at sf0.1 is simply
        // both LSH pipelines end-to-end; that's the price of a hard
        // verdict and matches dedup_near's audited budget.
        val stats = truth.withColumn("t", lit(1L))
          .join(found.withColumn("f", lit(1L)), Seq("id1", "id2"), "full")
          .agg(
            count(col("t")).as("nt"),
            sum(when(col("t").isNotNull && col("f").isNotNull, 1L)
              .otherwise(0L)).as("hits"),
            // every emitted simhash pair must be a true jaccard-≥0.5
            // pair (measured precision 1.0 on the planted corpus; a
            // fingerprint or banding bug that admits junk pairs makes
            // junk > 0 and flips the verdict)
            sum(when(col("t").isNull, 1L).otherwise(0L)).as("junk"))
        stats.select(explode(array(
          struct(lit("precision_subset").as("metric"),
            lit(null).cast("long").as("n"), (col("junk") === 0).as("ok")),
          struct(lit("recall_ge_04").as("metric"), col("nt").as("n"),
            (col("hits").cast("double") >=
              col("nt").cast("double") * 0.4).as("ok")))).as("r"))
          .select(col("r.metric").as("metric"), col("r.n").as("n"),
            col("r.ok").as("ok"))
          .orderBy("metric")
      },
      Some(s"WITH ${NearDup.TruthPairCtes}, tr AS (SELECT id1, id2 FROM p WHERE CAST(ni AS DOUBLE)/(n1+n2-ni) >= 0.5) SELECT * FROM (SELECT 'precision_subset' AS metric, CAST(NULL AS BIGINT) AS n, TRUE AS ok UNION ALL SELECT 'recall_ge_04' AS metric, (SELECT count(*) FROM tr) AS n, TRUE AS ok) ORDER BY metric"),
      scaleNote = "One aggregation produces the 64-bit fingerprint (8 bytes per doc — 100 TB of text collapses to GBs of signatures); banding turns near-pair search into 4 equi-joins on 16-bit keys. Hot 16-bit buckets (skewed band values) are salted or length-partitioned before the self-join at scale."),

    // SimHash estimator RESPONSE CURVE (r11) — dedup_minhash_
    // accuracy's sibling for the second fingerprint family: per
    // exact-similarity band, how does the 64-bit simhash Hamming
    // distance actually respond? MinHash agreement estimates Jaccard
    // DIRECTLY (err in the same units); simhash Hamming tracks the
    // ANGLE, so the honest measurement is the response curve —
    // Hamming stats per exact squared-cosine band, every column an
    // exact integer (cos²_bp = ni²·10⁴ div (na·nb) needs no sqrt and
    // no trig, so no float ever enters the gate). The bit family is
    // gate-portable: bit_b(doc) = majority over shingles of
    // ((coefA(b)·h + coefB(b)) mod P) mod 2 — dedup_near's OWN affine
    // family reused as sign hashes (estimator behavior is a property
    // of the family, not the base hash: dedup_minhash_accuracy's
    // argument) — and the candidate universe is the same df-capped
    // inverted index, so the two accuracy tables are read side by
    // side band-for-band. The spec asserts the curve is monotone:
    // mean Hamming falls as exact similarity rises — the property
    // that makes Hamming banding a usable dedup signal at all.
    QueryDef(
      "dedup_simhash_accuracy",
      (spark, sf) => {
        import NearDup.{P, coefA, coefB}
        // r16: candidate pairs + exact intersections come off the
        // sinked portable pair-truth table (NearDup.portablePairTable
        // — built once per session, shared with dedup_minhash_
        // accuracy); this operator keeps only its OWN half, the 64
        // bit-majority counters it measures.
        val sh = NearDup.portableShingles(Tables.documents(spark, sf))
          .localCheckpoint(false) // feeds the signature aggregate
        val cnts = (0 until Bits).map { b =>
          sum(pmod(lit(coefA(b)) * col("h") + lit(coefB(b)), lit(P)) % 2)
            .as(s"c$b")
        }
        val sig0 = sh.groupBy("doc_id")
          .agg(count(lit(1)).as("n"), cnts: _*)
        val sig = sig0.select(col("doc_id") +: (0 until Bits).map(b =>
          (col(s"c$b") * 2 > col("n")).cast("long").as(s"x$b")): _*)
        val s1 = sig.select(col("doc_id").as("id1") +:
          (0 until Bits).map(b => col(s"x$b").as(s"p$b")): _*)
        val s2 = sig.select(col("doc_id").as("id2") +:
          (0 until Bits).map(b => col(s"x$b").as(s"q$b")): _*)
        NearDup.portablePairTable(spark, sf)
          .join(s1, "id1").join(s2, "id2")
          .withColumn("ham", lit(64L) - (0 until Bits)
            .map(b => (col(s"p$b") === col(s"q$b")).cast("long"))
            .reduce(_ + _))
          // exact squared cosine of the shingle SETS in basis points —
          // integer-only (no sqrt): ni²·10⁴ div (|A|·|B|)
          .withColumn("cos2_bp", expr("(ni * ni * 10000) div (n1 * n2)"))
          .groupBy(expr("cos2_bp div 1000").as("cos2_band"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("ham")).as("sum_ham"),
            min(col("ham")).as("min_ham"),
            max(col("ham")).as("max_ham"))
          .orderBy("cos2_band")
      },
      Some {
        import NearDup.{P, MaxBucketDocs, coefA, coefB}
        val cs = (0 until Bits).map(b =>
          s"sum(((${coefA(b)}*h + ${coefB(b)}) % $P) % 2) AS c$b").mkString(", ")
        val xs = (0 until Bits).map(b =>
          s"CASE WHEN c$b*2 > n THEN 1 ELSE 0 END AS x$b").mkString(", ")
        val agree = (0 until Bits).map(b =>
          s"CASE WHEN x.x$b = y.x$b THEN 1 ELSE 0 END").mkString(" + ")
        s"WITH ${NearDup.PortableShingleSql}, " +
          s"okh AS (SELECT h FROM (SELECT h, count(*) AS df FROM s GROUP BY 1) WHERE df <= $MaxBucketDocs), " +
          "rare AS (SELECT s.doc_id, s.h FROM s JOIN okh USING (h)), " +
          "pc AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2 FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id), " +
          "nsz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1), " +
          "pi AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS ni FROM s a JOIN s b ON a.h = b.h AND a.doc_id < b.doc_id JOIN pc ON pc.id1 = a.doc_id AND pc.id2 = b.doc_id GROUP BY 1, 2), " +
          s"cn AS (SELECT doc_id, count(*) AS n, $cs FROM s GROUP BY doc_id), " +
          s"sg AS (SELECT doc_id, $xs FROM cn), " +
          s"ph AS (SELECT pc.id1, pc.id2, 64 - ($agree) AS ham FROM pc JOIN sg x ON pc.id1 = x.doc_id JOIN sg y ON pc.id2 = y.doc_id), " +
          "pp AS (SELECT (pi.ni*pi.ni*10000)//(n1.n*n2.n) AS cos2_bp, ph.ham " +
          "FROM pi JOIN ph ON pi.id1 = ph.id1 AND pi.id2 = ph.id2 JOIN nsz n1 ON pi.id1 = n1.doc_id JOIN nsz n2 ON pi.id2 = n2.doc_id) " +
          "SELECT cos2_bp//1000 AS cos2_band, count(*) AS n_pairs, " +
          "CAST(sum(ham) AS BIGINT) AS sum_ham, CAST(min(ham) AS BIGINT) AS min_ham, CAST(max(ham) AS BIGINT) AS max_ham " +
          "FROM pp GROUP BY 1 ORDER BY 1"
      },
      scaleNote = "Same economics as dedup_minhash_accuracy, which " +
        "is the point of sharing its scaffolding: candidates ride " +
        "the df-capped inverted index (pair expansion bounded at " +
        "C(cap,2) per hash), the 64 bit-majority counters are ONE " +
        "map-side-combined aggregate over the shingle rows (64 " +
        "conditional sums — the simhash vote, portably spelled), " +
        "and the per-pair Hamming is a codegen'd 64-term equality " +
        "sum on two 64-column signature rows. The response curve " +
        "is what SIZES a simhash deployment: mean Hamming per " +
        "similarity band tells you which Hamming threshold captures " +
        "your target similarity (and the band overlap prices the " +
        "false-positive rate), exactly the measurement that decides " +
        "simhash_near's maxHamming=3 — previously an assumed " +
        "constant, now a measured one."))
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generator for the sf1 SCALING sweep (BENCH_SCALING.md): a 10×-sf0.1
  * corpus with the SAME distributional character — uniform 30-word
  * vocabulary with a rare `dup` token and ~1% injected near-duplicate
  * docs, empirical lines-per-order histogram, uniform part keys — so
  * two-point (sf0.1 → sf1) scaling exponents of the candidate-
  * generating operators (q99/q21/q22/q44/q98/q94/q104/q61) measure
  * data-volume scaling, not a distribution shift. Deterministic: every
  * value derives from SplittableRandom(row id); no wall clock.
  *
  * Generates the tables the sweeps read (documents, lineitem, part,
  * embeddings, events, plus the TPC-H companions orders / customer /
  * supplier / nation / region for Part 7) — a bench corpus, not a
  * TESTDATA replacement.
  *
  * Usage: sbt "runMain graft.tools.MakeScaleData /tmp/sf1 10"
  */
object MakeScaleData {

  val Vocab: Array[String] = Array(
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch")

  val Langs: Array[(String, Double)] = Array(
    "en" -> 0.41, "zh" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "de" -> 0.14)

  /** sf0.1 lines-per-order histogram (1..17), used as the empirical
    * basket-size distribution at any scale. */
  val BasketHist: Array[(Int, Int)] = Array(
    1 -> 11016, 2 -> 21814, 3 -> 29500, 4 -> 29097, 5 -> 23631,
    6 -> 15625, 7 -> 8941, 8 -> 4407, 9 -> 1959, 10 -> 818, 11 -> 292,
    12 -> 93, 13 -> 29, 14 -> 10, 15 -> 1, 16 -> 2, 17 -> 1)

  private def pick[A](r: java.util.SplittableRandom,
      cum: Array[(A, Double)]): A = {
    val u = r.nextDouble()
    var acc = 0.0
    for ((a, w) <- cum) { acc += w; if (u < acc) return a }
    cum.last._1
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val mult = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .appName("make-scale-data").master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nDocs = 5000L * mult
    val nOrders = 150000L * mult
    val nParts = 20000L * mult

    // documents: uniform vocab words, length U[10,100]; 1% of docs are
    // near-copies of their predecessor with 2 words flipped to `dup`
    // (the rare-token / near-dup character of the source corpus)
    def docWords(id: Long): Array[String] = {
      val r = new java.util.SplittableRandom(id * 2654435761L + 7)
      val n = 10 + r.nextInt(91)
      Array.fill(n)(Vocab(r.nextInt(Vocab.length)))
    }
    val docs = spark.range(0, nDocs, 1, 64).map { id =>
      val r = new java.util.SplittableRandom(id * 1315423911L + 3)
      val words =
        if (id > 0 && id % 100 == 99) {
          val base = docWords(id - 1)
          val w = base.clone()
          w(r.nextInt(w.length)) = "dup"
          w(r.nextInt(w.length)) = "dup"
          w
        } else docWords(id)
      val text = words.mkString(" ")
      val lang = pick(r, Langs)
      (id, text, lang, s"src${r.nextInt(20)}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

    // lineitem: basket size from the empirical histogram, partkeys
    // uniform over the scaled part range (same per-part density)
    val basketCum = {
      val tot = BasketHist.map(_._2.toDouble).sum
      BasketHist.map { case (k, c) => k -> c / tot }
    }
    val lineitem = spark.range(0, nOrders, 1, 64).flatMap { o =>
      val r = new java.util.SplittableRandom(o * 40503L + 11)
      val k = pick(r, basketCum)
      (1 to k).map { ln =>
        (o, r.nextLong(nParts), r.nextLong(nParts / 10), ln,
          1.0 + r.nextInt(50), 900.0 + r.nextDouble() * 10000,
          r.nextInt(11) / 100.0, r.nextInt(9) / 100.0,
          if (r.nextInt(2) == 0) "N" else "R",
          if (r.nextInt(2) == 0) "O" else "F",
          // testdata's shipdate window (1995-01-01 + ~2500 d) so the
          // TPC-H queries' date literals are non-degenerate at scale.
          // Safe to retarget: shipdate is the LAST draw per line (no
          // other column's value shifts) and no committed scaling
          // number reads it (q99 reads part names, the co-purchase
          // family reads orderkey/partkey only).
          new java.sql.Timestamp(788918400000L + r.nextLong(216000000000L)))
      }
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .withColumn("l_linenumber", col("l_linenumber").cast("int"))

    // p_name mirrors the source structure exactly: 2 words from an
    // 8-adjective x 8-noun palette (~64 distinct names), so q99's
    // identical-name groups — and therefore its inherently quadratic
    // answer — scale the same way the driver corpus's do
    val adjs = Array("large", "hot", "blue", "old", "cold", "dim",
      "new", "red")
    val nouns = Array("ring", "bolt", "plate", "cap", "screw", "nut",
      "gear", "pin")
    // brand/type/size/price mirror testdata's scheme (Brand#1..25,
    // the 6 type values, size 1..50, price 900–999.9) so the TPC-H
    // queries' literal filters stay non-degenerate at scale; p_name's
    // draws come FIRST, so the q99-committed name distribution is
    // bit-identical to the earlier corpus revisions
    val ptypes = Array("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
      "STANDARD")
    val part = spark.range(0, nParts, 1, 32).map { p =>
      val r = new java.util.SplittableRandom(p * 69069L + 5)
      (p, s"${adjs(r.nextInt(8))} ${nouns(r.nextInt(8))}",
        s"Brand#${r.nextInt(25) + 1}",
        ptypes(r.nextInt(6)), r.nextInt(50) + 1,
        900.0 + (p % 1000) / 10.0)
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice")
      .withColumn("p_size", col("p_size").cast("int"))

    // embeddings: unit-norm 64-dim pseudo-gaussian vectors (Box-Muller
    // from the seeded stream), labels uniform 0..9 — the source table
    // has NO label-cluster structure (measured intra ≈ inter cosine
    // ≈ 0), so i.i.d. random directions are the faithful model
    val nVecs = 2000L * mult
    val embeddings = spark.range(0, nVecs, 1, 32).map { id =>
      val r = new java.util.SplittableRandom(id * 104729L + 13)
      val g = Array.fill(64) {
        val u1 = math.max(r.nextDouble(), 1e-12); val u2 = r.nextDouble()
        math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
      }
      val norm = math.sqrt(g.map(x => x * x).sum)
      (id, g.map(x => (x / norm).toFloat), r.nextInt(10))
    }.toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))

    // events: the driver table's measured character — a FIXED 30-day
    // calendar window (scaling adds rows and users, not days — the SF
    // convention), 5 near-uniform event types, uniform user draw
    // (1500 users per 100k events), value U(0,100] at 2dp, {"k": N}
    // props. Event-family scaling then measures volume, not drift.
    val nEvents = 100000L * mult
    val nUsers = 1500L * mult
    val types = Array("click", "error", "purchase", "signup", "view")
    val events = spark.range(0, nEvents, 1, 64).map { id =>
      val r = new java.util.SplittableRandom(id * 2862933555777941757L + 17)
      val ts = new java.sql.Timestamp(
        1704067200000L + r.nextLong(30L * 24 * 3600 * 1000))
      (id, ts, r.nextLong(nUsers), types(r.nextInt(5)),
        math.rint((0.01 + r.nextDouble() * 99.99) * 100) / 100,
        s"""{"k": ${r.nextInt(100)}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    // --- TPC-H companions (Part 7 of BENCH_SCALING.md) -------------
    // Measured testdata character: o_orderdate and l_shipdate are
    // INDEPENDENT uniforms over the same ~6.6-year window (lead-day
    // quantiles at sf0.1 are uniform ±2100 d around +47), statuses
    // and priorities uniform, acctbal U[-1000, 10000] (~8% negative
    // suppliers — Q16's exclusion stays non-degenerate), custkeys
    // uniform. nation/region are FIXED-size dims at every multiplier
    // (the TPC-H convention).
    val nCust = 15000L * mult
    val nSupp = nParts / 10 // matches lineitem's l_suppkey domain
    val statuses = Array("O", "P", "F")
    val prios = Array("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW")
    val segs = Array("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY")

    val orders = spark.range(0, nOrders, 1, 64).map { o =>
      val r = new java.util.SplittableRandom(o * 9176212931L + 23)
      (o, r.nextLong(nCust),
        statuses(r.nextInt(3)),
        math.rint((1000.0 + r.nextDouble() * 499000.0) * 100) / 100,
        new java.sql.Timestamp(788918400000L + r.nextLong(207360000000L)),
        prios(r.nextInt(5)))
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

    val customer = spark.range(0, nCust, 1, 32).map { c =>
      val r = new java.util.SplittableRandom(c * 2246822519L + 29)
      (c, f"Customer#$c%09d", r.nextInt(25),
        math.rint((-1000.0 + r.nextDouble() * 11000.0) * 100) / 100,
        segs(r.nextInt(5)))
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
      .withColumn("c_nationkey", col("c_nationkey").cast("int"))

    val supplier = spark.range(0, nSupp, 1, 8).map { s =>
      val r = new java.util.SplittableRandom(s * 3266489917L + 31)
      (s, f"Supplier#$s%09d", r.nextInt(25),
        math.rint((-1000.0 + r.nextDouble() * 11000.0) * 100) / 100)
    }.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .withColumn("s_nationkey", col("s_nationkey").cast("int"))

    val nation = (0 until 25)
      .map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"),
      (3, "EUROPE"), (4, "MIDDLE EAST"))
      .toDF("r_regionkey", "r_name")

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"wrote $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    write(docs, "documents")
    write(lineitem, "lineitem")
    write(part, "part")
    write(embeddings, "embeddings")
    write(events, "events")
    write(orders, "orders")
    write(customer, "customer")
    write(supplier, "supplier")
    write(nation, "nation")
    write(region, "region")
    spark.stop()
  }
}

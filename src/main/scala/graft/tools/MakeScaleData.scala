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
  * Generates ONLY the tables the sweeps read (documents, lineitem,
  * part, embeddings, events) — a bench corpus, not a TESTDATA
  * replacement.
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
          new java.sql.Timestamp(694224000000L + r.nextLong(94608000000L)))
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
    val part = spark.range(0, nParts, 1, 32).map { p =>
      val r = new java.util.SplittableRandom(p * 69069L + 5)
      (p, s"${adjs(r.nextInt(8))} ${nouns(r.nextInt(8))}",
        s"Brand#${r.nextInt(5) + 1}${r.nextInt(5) + 1}",
        s"type${r.nextInt(150)}", r.nextInt(50) + 1,
        900.0 + (p % 2000) / 10.0)
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

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"wrote $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    write(docs, "documents")
    write(lineitem, "lineitem")
    write(part, "part")
    write(embeddings, "embeddings")
    write(events, "events")
    spark.stop()
  }
}

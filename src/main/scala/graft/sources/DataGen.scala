package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic large-scale synthetic documents/embeddings for the
  * scale-up benchmarks (the driver's /root/testdata tops out at sf0.1 =
  * 5k docs / 2k vectors; the scale evidence needs ~100x that). Pure column
  * arithmetic over `spark.range` — seeded, fully distributed, same rows at
  * any parallelism — mirroring the testdata tables' shapes:
  * documents(doc_id long, text string), embeddings(vec_id long,
  * embedding array<float>).
  *
  * The document corpus carries the duplicate structure a web-scale dedup
  * input has: ~15% exact duplicates of a small hot pool (exercises the
  * exact-collapse-before-banding path) and ~10% near-duplicates — a pool
  * text plus one unique marker token (exercises the hot-band cap: a pool of
  * p texts with g/p near-identical variants each shares most minhash bands).
  */
object DataGen {

  private val vocab: Array[String] =
    ("the quick brown fox jumps over lazy dog while seven wizards toss " +
      "amber flasks under bright crystal moons and silent rivers carry " +
      "ancient stories toward distant harbors where curious travelers " +
      "gather spices maps lanterns ropes barrels candles feathers marbles " +
      "copper silver engines pistons valves circuits signals packets " +
      "routers parsers tokens buffers shards clusters replicas brokers " +
      "streams batches windows triggers offsets commits leases quorums").split("\\s+")

  /** `nDocs` documents, ~45 words each (~300 chars, like the testdata). */
  def documents(spark: SparkSession, nDocs: Long, seed: Long = 42L,
      wordsPerDoc: Int = 45, hotPool: Long = 200L): DataFrame = {
    val base = spark.range(nDocs).withColumnRenamed("id", "doc_id")
    val kind = pmod(xxhash64(col("doc_id"), lit(seed)), lit(100L))
    val poolId = pmod(xxhash64(col("doc_id"), lit(seed + 1)), lit(hotPool))
    // the text is a pure function of a content id, so exact duplicates are
    // genuinely byte-identical without a self-join
    val contentId = when(kind < 15, poolId) // exact duplicate of a pool text
      .when(kind < 25, poolId) // near-duplicate: pool text + marker below
      .otherwise(col("doc_id") + lit(hotPool)) // unique text
    val vocabLit = typedlit(vocab)
    val words = (0 until wordsPerDoc).map(i =>
      element_at(vocabLit,
        (pmod(xxhash64(contentId, lit(seed + 2 + i)), lit(vocab.length.toLong)) + 1)
          .cast("int")))
    val baseText = concat_ws(" ", words: _*)
    val text = when(kind >= 15 && kind < 25,
      concat(baseText, lit(" marker"), col("doc_id")))
      .otherwise(baseText)
    base.select(col("doc_id"), text.as("text"))
  }

  /** `nVecs` embeddings, uniform floats in [-1, 1] (testdata-shaped). */
  def embeddings(spark: SparkSession, nVecs: Long, dims: Int = 64,
      seed: Long = 42L): DataFrame = {
    val base = spark.range(nVecs).withColumnRenamed("id", "vec_id")
    val comps = (0 until dims).map(i =>
      ((pmod(xxhash64(col("vec_id"), lit(seed + i)), lit(2000001L)) - lit(1000000L)) /
        lit(1000000.0)).cast("float"))
    base.select(col("vec_id"), array(comps: _*).as("embedding"))
  }

  /** `nEvents` rows mirroring the testdata `events` table shape
    * (event_id long, ts timestamp, user_id long, event_type string,
    * value double, props string): 5-way event_type split incl. ~20%
    * `error`, a 30-day timestamp window, user cardinality scaled with the
    * row count (testdata ratio: 1.5k users per 100k events). Input for the
    * traces/metrics exporter scale-up ops.
    */
  def events(spark: SparkSession, nEvents: Long, seed: Long = 42L): DataFrame = {
    val nUsers = math.max(100L, nEvents / 66L)
    val base = spark.range(nEvents).withColumnRenamed("id", "event_id")
    val types = typedlit(Array("signup", "click", "purchase", "error", "view"))
    val secs = pmod(xxhash64(col("event_id"), lit(seed)), lit(2592000L))
    val micros = pmod(xxhash64(col("event_id"), lit(seed + 1)), lit(1000000L))
    base.select(
      col("event_id"),
      timestamp_micros(lit(1704067200000000L) + secs * 1000000L + micros).as("ts"),
      pmod(xxhash64(col("event_id"), lit(seed + 2)), lit(nUsers)).as("user_id"),
      element_at(types,
        (pmod(xxhash64(col("event_id"), lit(seed + 3)), lit(5L)) + 1).cast("int"))
        .as("event_type"),
      (pmod(xxhash64(col("event_id"), lit(seed + 4)), lit(56021L)) / lit(100.0))
        .as("value"),
      concat(lit("""{"k":"""),
        pmod(xxhash64(col("event_id"), lit(seed + 5)), lit(1000L)),
        lit("}")).as("props"))
  }
}

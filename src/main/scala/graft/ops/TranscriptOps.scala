package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation operators specific to MULTI-TURN TRANSCRIPT corpora
  * (conv_id, turn_idx, role, text, tool, ...) — the payload this engine's
  * flagship pipeline parses. Document-level ops (Dedup/CleanFilters/...)
  * treat a row as an independent unit; these preserve conversation
  * structure: a turn only means something in its (conv_id, turn_idx)
  * position.
  *
  * Scale notes (10^12 turns):
  *  - every op here keys on conv_id and orders by turn_idx WITHIN the
  *    group — one shuffle on the conversation id, per-group sort bounded
  *    by one conversation's turn count (the flagship's salting note
  *    applies to pathological hot conversations);
  *  - packing is the per-conversation form of ops/Packing.scala's
  *    concat-and-chunk: window = prefix-tokens-before / budget, straddling
  *    turns land in the window their FIRST token falls in (never split) —
  *    a running-sum window over (conv, turn order), no global sort;
  *  - loop/quality signals are gaps-and-islands window arithmetic —
  *    deterministic, SQL-replicable, zero custom state.
  */
object TranscriptOps {

  private def byConv = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))

  /** Whitespace token count (the corpus-side budget unit). */
  def turnTokens(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** Per-conversation context-window packing: assigns each turn the
    * window its FIRST token falls in under `tokenBudget` (turns never
    * split; a straddling turn belongs to the window where it starts —
    * ops/Packing.scala semantics, per conversation). Adds
    * (n_tokens, window_idx).
    */
  def packTurns(turns: DataFrame, tokenBudget: Int): DataFrame = {
    val prefixBefore =
      coalesce(sum(col("n_tokens")).over(byConv.rowsBetween(
        Window.unboundedPreceding, -1)), lit(0L))
    turns.withColumn("n_tokens", turnTokens(col("text")).cast("long"))
      .withColumn("window_idx", (prefixBefore / tokenBudget).cast("long"))
  }

  /** Packed-window summary: one row per (conv_id, window_idx) with turn
    * span, token fill, and a rebuilt-window digest (role-prefixed turns
    * joined in order — the training-sample shape).
    */
  def packedWindows(turns: DataFrame, tokenBudget: Int): DataFrame =
    packTurns(turns, tokenBudget)
      .groupBy(col("conv_id"), col("window_idx"))
      .agg(count(lit(1)).as("n_turns"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("turn_idx")).as("first_turn"),
        max(col("turn_idx")).as("last_turn"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("turn_idx"), col("role"), col("text")))),
          t => concat(t.getField("role"), lit(": "), t.getField("text"))),
          "\n")).as("window_md5"))

  /** Agent-loop and structure signals per conversation:
    *  - max_run: longest run of consecutive turns with the same
    *    (role, tool) — a stuck tool loop shows as a long run;
    *  - repeat_frac: fraction of turns (beyond the first) whose
    *    (tool, text) exactly equals the previous turn's — verbatim
    *    retry loops;
    *  - role_alternation: fraction of adjacent pairs that switch role —
    *    healthy dialogue sits near 1, monologue dumps near 0.
    * Runs come from the gaps-and-islands trick: island id =
    * row_number - row_number-within-(role,tool), both over turn order.
    */
  def loopSignals(turns: DataFrame): DataFrame = {
    val key = concat_ws("", col("role"), coalesce(col("tool"), lit("")))
    val withRuns = turns
      .withColumn("__rn", row_number().over(byConv))
      .withColumn("__rnk", row_number().over(
        Window.partitionBy(col("conv_id"), key).orderBy(col("turn_idx"))))
      .withColumn("__island", col("__rn") - col("__rnk"))
      .withColumn("__prev_role", lag(col("role"), 1).over(byConv))
      .withColumn("__prev_sig",
        lag(concat_ws("", coalesce(col("tool"), lit("")), col("text")), 1)
          .over(byConv))
    val runs = withRuns
      .groupBy(col("conv_id"), key.as("__key"), col("__island"))
      .agg(count(lit(1)).as("__run"))
      .groupBy(col("conv_id")).agg(max(col("__run")).as("max_run"))
    val pairwise = withRuns.groupBy(col("conv_id")).agg(
      count(lit(1)).as("n_turns"),
      sum(when(col("__prev_sig").isNotNull &&
        col("__prev_sig") === concat_ws("",
          coalesce(col("tool"), lit("")), col("text")), 1L).otherwise(0L))
        .as("n_repeats"),
      sum(when(col("__prev_role").isNotNull &&
        col("__prev_role") =!= col("role"), 1L).otherwise(0L))
        .as("n_switches"))
    pairwise.join(runs, Seq("conv_id"))
      .select(col("conv_id"), col("n_turns"), col("max_run"),
        round(col("n_repeats").cast("double") /
          greatest(col("n_turns") - 1, lit(1L)), 6).as("repeat_frac"),
        round(col("n_switches").cast("double") /
          greatest(col("n_turns") - 1, lit(1L)), 6).as("role_alternation"))
  }

  /** Time-gap sessionization: a session breaks where the idle gap to the
    * previous turn exceeds `gapSeconds`. Comparison and session index are
    * pure integer arithmetic over epoch MICROseconds (`unix_micros` here,
    * `epoch_us` in the oracle) so results are bit-identical cross-engine.
    * session_idx = running count of breaks over turn order
    * (gaps-and-islands); one conv_id shuffle, per-group sort bounded by
    * one conversation's turn count.
    */
  def sessionize(turns: DataFrame, gapSeconds: Long): DataFrame = {
    val prev = lag(unix_micros(col("ts")), 1).over(byConv)
    turns
      .withColumn("__brk",
        when(prev.isNotNull &&
          unix_micros(col("ts")) - prev > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("__brk")).over(byConv.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__brk")
  }

  /** Per-session summary: turn span, bounds, duration — epochs stay exact
    * integer micros so the row set hash-compares cross-engine.
    */
  def sessionStats(turns: DataFrame, gapSeconds: Long): DataFrame =
    sessionize(turns, gapSeconds)
      .groupBy(col("conv_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_turns"),
        min(col("turn_idx")).as("first_turn"),
        max(col("turn_idx")).as("last_turn"),
        min(unix_micros(col("ts"))).as("start_epoch_us"),
        max(unix_micros(col("ts"))).as("end_epoch_us"))
      .withColumn("duration_us", col("end_epoch_us") - col("start_epoch_us"))

  /** Tool-transition matrix: (from_tool -> to_tool) counts over consecutive
    * turns within a conversation (null tool renders ""), with the
    * conditional transition probability quantized to e6 by pure integer
    * half-up rounding `(n*2e6 + total) div (2*total)` — no float division,
    * so probabilities are bit-identical cross-engine. The agent-behavior
    * Markov chain: dominant self-loops are stuck tools, low-entropy rows
    * are scripted flows. Edge extraction is one conv_id shuffle; the edge
    * table is |tools|^2-bounded, so the per-from normalization window is
    * driver-trivial at any corpus size.
    */
  def toolTransitions(turns: DataFrame): DataFrame = {
    val edges = turns
      .withColumn("__sig", coalesce(col("tool"), lit("")))
      .withColumn("__from", lag(col("__sig"), 1).over(byConv))
      .filter(col("__from").isNotNull)
      .groupBy(col("__from").as("from_tool"), col("__sig").as("to_tool"))
      .agg(count(lit(1)).as("n"))
    edges
      .withColumn("from_total",
        sum(col("n")).over(Window.partitionBy(col("from_tool"))))
      .withColumn("prob_e6",
        expr("(n * 2000000L + from_total) div (2L * from_total)"))
  }

  /** Prefix digest rows for cross-conversation shared-prefix detection:
    * for each conversation, md5 of the newline-joined first-k-turn text
    * prefix for k = 1..min(maxDepth, n_turns). The explode is bounded at
    * maxDepth rows per conversation, and per-conversation work is
    * O(maxDepth * prefix_chars) — collect_list is bounded by one
    * conversation's turns, the same bound packedWindows already carries.
    */
  def prefixDigests(turns: DataFrame, maxDepth: Int): DataFrame =
    turns.groupBy(col("conv_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("turn_idx"), col("text")))),
        t => t.getField("text")).as("__texts"))
      .select(col("conv_id"),
        explode(transform(
          sequence(lit(1), least(lit(maxDepth), size(col("__texts")))),
          k => struct(k.cast("long").as("prefix_depth"),
            md5(array_join(slice(col("__texts"), lit(1), k), "\n"))
              .as("prefix_md5")))).as("p"))
      .select(col("conv_id"), col("p.prefix_depth"), col("p.prefix_md5"))

  /** Cross-conversation shared-prefix stats — the transcript corpus's
    * "duplicated system prompt / few-shot preamble" detector: per
    * conversation, the deepest k whose first-k-turn prefix is shared by
    * >=2 conversations, and how many share it at that depth (1/0 when
    * nothing is shared). Counting groups on the (depth, 16-byte digest)
    * key — maxDepth rows per conversation move through the shuffle, never
    * the texts.
    */
  def sharedPrefixStats(turns: DataFrame, maxDepth: Int): DataFrame = {
    val d = prefixDigests(turns, maxDepth)
    val counts = d.groupBy(col("prefix_depth"), col("prefix_md5"))
      .agg(count(lit(1)).as("n_convs"))
    // "n_convs at the deepest shared depth" as max over ONE packed BIGINT
    // (depth * 2^48 + n_convs; depth is maxDepth-bounded, n_convs < 2^48
    // at any conceivable corpus) — a max(struct(...)) here would silently
    // downgrade the whole aggregation to SortAggregate (no hash buffer for
    // struct maxes), sorting every partition of the conv-keyed shuffle
    val P = 281474976710656L // 2^48
    d.join(counts, Seq("prefix_depth", "prefix_md5"))
      .groupBy(col("conv_id"))
      .agg(
        coalesce(max(when(col("n_convs") >= 2, col("prefix_depth"))), lit(0L))
          .as("max_shared_depth"),
        coalesce(pmod(max(when(col("n_convs") >= 2,
          col("prefix_depth") * lit(P) + col("n_convs"))), lit(P)),
          lit(1L)).as("n_convs_at_max"))
  }

  /** Mean-pooled conversation embedding from per-turn embeddings — the
    * conversation-level representation conv-granularity semantic dedup /
    * clustering runs on. Exact cross-engine: each float widens to double
    * (lossless), quantizes to round(x*1e6) BIGINT BEFORE the sum (integer
    * sums are summation-order-free, where a float mean depends on
    * reduction order), and the mean is integer division truncating toward
    * zero (both Spark's `div` and DuckDB's integer `//` truncate, verified
    * on negative sums). One (conv, dim)-keyed shuffle with map-side
    * partials; group count = convs x dims regardless of corpus size.
    */
  def convEmbeddings(turnVecs: DataFrame, idCol: String = "conv_id",
      vecCol: String = "embedding"): DataFrame =
    turnVecs
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col(idCol), col("dim"))
      .agg(sum(expr("CAST(round(CAST(x AS DOUBLE) * 1000000d) AS BIGINT)"))
        .as("sum_e6"),
        count(lit(1)).as("n_turns"))
      .withColumn("mean_e6",
        expr("sum_e6 div n_turns"))

  /** Conversation-level curation GATE — the transcript analogue of
    * [[CleanFilters.cleanCorpus]]: one keep/drop decision per conversation
    * with per-rule reason flags, composed from [[loopSignals]] (stuck-tool
    * runs, verbatim retries, monologue dumps) and [[turnDedupStats]]
    * (boilerplate / re-run detection) plus turn-count bounds. All
    * threshold comparisons run on the 6-decimal-rounded fractions the
    * underlying ops already emit, so keep flags are bit-identical
    * cross-engine. Scale shape is the union of the composed ops' shapes
    * (two conv-keyed window passes + one digest shuffle); the gate itself
    * adds only a conv-keyed join of two conv-sized aggregates and a
    * codegen projection.
    */
  def transcriptGate(turns: DataFrame, maxRun: Long = 4L,
      maxRepeatFrac: Double = 0.4, minAlternation: Double = 0.2,
      maxDupTurnFrac: Double = 0.5, minTurns: Long = 3L,
      maxTurns: Long = 2000L): DataFrame =
    loopSignals(turns)
      .join(turnDedupStats(turns).drop("n_turns"), Seq("conv_id"))
      .withColumn("pass_length",
        col("n_turns") >= minTurns && col("n_turns") <= maxTurns)
      .withColumn("pass_run", col("max_run") <= maxRun)
      .withColumn("pass_repeat", col("repeat_frac") <= maxRepeatFrac)
      .withColumn("pass_alternation", col("role_alternation") >= minAlternation)
      .withColumn("pass_dup", col("dup_turn_frac") <= maxDupTurnFrac)
      .withColumn("keep",
        col("pass_length") && col("pass_run") && col("pass_repeat") &&
          col("pass_alternation") && col("pass_dup"))
      .select("conv_id", "n_turns", "max_run", "repeat_frac",
        "role_alternation", "dup_turn_frac", "pass_length", "pass_run",
        "pass_repeat", "pass_alternation", "pass_dup", "keep")

  /** Per-tool outcome analytics over tool turns: call count, error count
    * (an `errorPattern` regex over the tool turn's own text — the tool
    * RESULT in transcript form), and immediate-retry count (the next tool
    * turn in the conversation calls the same tool — the stuck-tool signal
    * at tool granularity, where [[loopSignals]] flags it per
    * conversation). Rates are e6-quantized by the same pure-integer
    * half-up rounding as [[toolTransitions]] — no float division on
    * either engine. One conv-keyed window pass over tool turns only, then
    * a tool-keyed aggregate bounded by the tool vocabulary.
    */
  def toolOutcomes(turns: DataFrame,
      errorPattern: String = "(?i)error|fail|exception|timeout"): DataFrame = {
    val toolTurns = turns.filter(col("tool").isNotNull)
      .withColumn("__next_tool", lead(col("tool"), 1).over(byConv))
    toolTurns
      .groupBy(col("tool"))
      .agg(count(lit(1)).as("n_calls"),
        sum(when(col("text").rlike(errorPattern), 1L).otherwise(0L))
          .as("n_errors"),
        sum(when(col("__next_tool") === col("tool"), 1L).otherwise(0L))
          .as("n_retries"))
      .withColumn("error_e6",
        expr("(n_errors * 2000000L + n_calls) div (2L * n_calls)"))
      .withColumn("retry_e6",
        expr("(n_retries * 2000000L + n_calls) div (2L * n_calls)"))
  }

  /** Corpus-wide turn-level exact dedup, keep-first by (conv_id,
    * turn_idx): returns per-conversation duplicate-turn stats — the
    * transcript analogue of paragraph dedup (a conversation whose turns
    * mostly appear elsewhere is boilerplate or a re-run). One shuffle on
    * the 16-byte turn digest; within-group sort bounded by one turn's
    * duplicate count.
    */
  def turnDedupStats(turns: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("__th")).orderBy(col("conv_id"), col("turn_idx"))
    turns.withColumn("__th", md5(col("text")))
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("__rn") > 1, 1L).otherwise(0L)).as("n_dup_turns"))
      .select(col("conv_id"), col("n_turns"), col("n_dup_turns"),
        round(col("n_dup_turns").cast("double") / col("n_turns"), 6)
          .as("dup_turn_frac"))
  }

  /** Canonical turn TEMPLATE: lowercase, digit runs -> '#', whitespace
    * collapsed — the normalization that makes 'Request 12345 completed in
    * 678 ms' and 'Request 9 completed in 3 ms' the same string. Pure
    * codegen regex chain (Java-regex ∩ RE2 subset, same policy as
    * ops/Curation's PII patterns).
    */
  def turnTemplate(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[0-9]+", "#"), "\\s+", " "))

  /** Template boilerplate mining: the turns whose NORMALIZED form exceeds
    * a phi frequency share — injected system prompts, templated tool
    * results, canned apologies — via the bounded-state Misra-Gries
    * pass + exact verification ([[FreqStats.heavyHitters]]). Template
    * normalization is what lifts this above [[turnDedupStats]]: verbatim
    * dedup can't see 'Request 12 …' / 'Request 97 …' as one pattern.
    * Scale shape = heavyHitters': one k-counter aggregation over the
    * corpus + one `isin`-pushdown exact count over ≤k candidates.
    */
  def turnTemplates(turns: DataFrame, phi: Double = 0.01,
      k: Int = 128): DataFrame =
    FreqStats.heavyHitters(
      turns.select(turnTemplate(col("text")).as("tpl")), col("tpl"), phi, k)

  /** Conversation-level semantic retrieval: top-k nearest conversations
    * to `queryConv` by cosine over the [[convEmbeddings]] long-form table
    * (conv_id, dim, mean_e6). The arithmetic stays EXACT until the last
    * step: dot products and squared norms are sums of BIGINT products of
    * the e6-quantized means (order-free — 64 dims x (1e6)^2 stays under
    * 2^53, so both the integer sums and their double casts are exact);
    * the only floating ops are two correctly-rounded sqrts, one multiply,
    * one divide — IEEE-identical on any engine — and the result is
    * e6-quantized for the output. Ties break on conv_id.
    *
    * Scale shape: the query side is ONE conversation's dims (broadcast
    * dim-join); the corpus side is the derived conv-vector table
    * (convs x dims rows — already 3-4 orders smaller than the turn
    * table), read once for the dot agg and once for norms. At 100 TB the
    * conv-vector table is a persisted intermediate and high-QPS retrieval
    * goes through the LSH/signature index (ops/Similarity) — this is the
    * exact base the index variants verify against, like ann_brute.
    */
  def convTopK(convVecs: DataFrame, queryConv: Long, k: Int): DataFrame = {
    val norms = convVecs.groupBy(col("conv_id"))
      .agg(sum(col("mean_e6") * col("mean_e6")).as("norm"))
    val q = broadcast(convVecs.filter(col("conv_id") === queryConv)
      .select(col("dim"), col("mean_e6").as("__qm")))
    val qNorm = broadcast(norms.filter(col("conv_id") === queryConv)
      .select(col("norm").as("__qnorm")))
    convVecs.filter(col("conv_id") =!= queryConv)
      .join(q, Seq("dim"))
      .groupBy(col("conv_id"))
      .agg(sum(col("mean_e6") * col("__qm")).as("dot"))
      .join(norms, Seq("conv_id"))
      .crossJoin(qNorm)
      .withColumn("cosine_e6",
        floor(col("dot").cast("double") /
          (sqrt(col("norm").cast("double")) *
            sqrt(col("__qnorm").cast("double"))) * 1000000d + 0.5d)
          .cast("long"))
      .orderBy(col("cosine_e6").desc, col("conv_id").asc)
      .limit(k)
      .select(col("conv_id"), col("dot"), col("cosine_e6"))
  }

  /** SFT (instruction-tuning) pair extraction: one (prompt, response) row
    * per assistant turn, where the prompt is the NEAREST PRECEDING user
    * turn in the same conversation (tool turns between them are context,
    * not prompt). Assistant turns with no prior user turn (conversation
    * openers, system-only prefixes) are dropped — there is nothing to
    * condition on. `n_context_turns` counts ALL turns before the response
    * (the context-window budget a sample would need).
    *
    * Scale shape: ONE conv-keyed window pass (the same
    * partitionBy(conv_id).orderBy(turn_idx) sort every transcript op here
    * shares — Catalyst reuses a single sort for both window functions),
    * then a codegen filter/projection. No joins, no second shuffle.
    */
  def sftPairs(turns: DataFrame, minResponseChars: Int = 1): DataFrame = {
    val before = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    turns
      .withColumn("__prompt",
        last(when(col("role") === "user", col("text")), ignoreNulls = true)
          .over(before))
      .withColumn("__n_ctx", count(lit(1)).over(before))
      .filter(col("role") === "assistant" && col("__prompt").isNotNull &&
        length(col("text")) >= minResponseChars)
      .select(col("conv_id"), col("turn_idx"),
        col("__prompt").as("prompt"), col("text").as("response"),
        col("__n_ctx").as("n_context_turns"),
        length(col("__prompt")).as("prompt_chars"),
        length(col("text")).as("response_chars"))
  }

  /** Chat-template rendering: serialize each conversation into ONE
    * training-ready text in strict turn order —
    * `<|role|>\ntext\n<|end|>\n` per turn, where a tool turn renders as
    * `<|tool:name|>`. Emits the rendered text plus its md5 digest and
    * char count, so downstream exact-dedup/sharding can key on the digest
    * without re-reading the text.
    *
    * Scale shape: per-turn rendering is a codegen concat; the
    * conversation assembly is one conv-keyed aggregate whose buffer is
    * bounded by ONE conversation's turns (collect_list + array_sort —
    * the same deliberate bounded-buffer ObjectHashAggregate shape as
    * [[packedWindows]] and conv-granularity minhash). Output rows are
    * conversations, 3-4 orders fewer than turns.
    */
  def renderChat(turns: DataFrame): DataFrame = {
    val roleTag = when(col("tool").isNotNull && col("tool") =!= "",
      concat(lit("tool:"), col("tool"))).otherwise(col("role"))
    val rendered = concat(lit("<|"), roleTag, lit("|>\n"), col("text"),
      lit("\n<|end|>\n"))
    turns
      .select(col("conv_id"), col("turn_idx"), rendered.as("__r"))
      .groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        sum(length(col("__r"))).as("n_chars"),
        array_join(transform(
          array_sort(collect_list(struct(col("turn_idx"), col("__r")))),
          x => x.getField("__r")), "").as("text"))
      .withColumn("digest", md5(col("text")))
  }

  /** Preference-pair (DPO-style) mining from retry structure: when the
    * SAME normalized user prompt ([[turnTemplate]] — digit runs
    * collapsed, case/whitespace folded) draws two or more assistant
    * responses in one conversation, the user was re-asking — the FIRST
    * response is the implicit reject, the LAST the implicit accept.
    * Emits (conv_id, prompt_tpl, n_attempts, rejected, chosen) with the
    * turn indices so a downstream gate can bound the retry distance.
    *
    * Scale shape: [[sftPairs]]' single window pass, then ONE
    * (conv_id, prompt_tpl)-keyed sort shared by all the group window
    * functions. Deliberately NOT a min_by/max_by aggregation: string
    * aggregation buffers aren't hash-aggregable, so that plan degrades to
    * a SortAggregate — the window form sorts exactly once on the same
    * keys and keeps the projection in codegen. Group frames are bounded
    * by one prompt's retry count. Ties cannot occur: turn_idx is unique
    * within a conversation.
    */
  def preferencePairs(turns: DataFrame): DataFrame = {
    val grp = Window.partitionBy(col("conv_id"), col("prompt_tpl"))
    val byTurn = grp.orderBy(col("turn_idx"))
    val full = byTurn.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    sftPairs(turns)
      .withColumn("prompt_tpl", turnTemplate(col("prompt")))
      .withColumn("__rn", row_number().over(byTurn))
      .withColumn("__n", count(lit(1)).over(grp))
      .withColumn("__chosen_turn", last(col("turn_idx")).over(full))
      .withColumn("__chosen", last(col("response")).over(full))
      .filter(col("__n") >= 2 && col("__rn") === 1)
      .select(col("conv_id"), col("prompt_tpl"),
        col("__n").as("n_attempts"),
        col("turn_idx").as("rejected_turn"),
        col("__chosen_turn").as("chosen_turn"),
        col("response").as("rejected"),
        col("__chosen").as("chosen"))
  }

  /** Leakage-proof train/val/test split: the split is keyed on
    * `conv_id` — every turn of a conversation lands in the same split BY
    * CONSTRUCTION (the leakage a row-level random split causes: val
    * prompts whose context appeared in train). Assignment is the
    * engine's standard content-stable sampling idiom (md5 hex-prefix
    * threshold, the [[Curation.temperatureSample]] mechanism): bucket =
    * first 4 md5 hex chars of the conv id, train below
    * `trainPct%` of 0x10000, val below `trainPct+valPct`, else test —
    * deterministic, re-runnable, and identical on any engine with md5.
    * Emits per-split conversation/turn/char counts (the split audit).
    *
    * Scale shape: a per-row codegen projection (md5 + two string
    * compares), then one groupBy on a 3-value key with a
    * partial-aggregated distinct on conv_id. No window, no sort.
    */
  def leakproofSplit(turns: DataFrame, trainPct: Int = 90,
      valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100)
    val h = substring(md5(col("conv_id").cast("string")), 1, 4)
    val trainThr = f"${trainPct * 65536 / 100}%04x"
    val valThr = f"${(trainPct + valPct) * 65536 / 100}%04x"
    turns
      .withColumn("split",
        when(h < trainThr, "train").when(h < valThr, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(countDistinct(col("conv_id")).as("n_convs"),
        count(lit(1)).as("n_turns"),
        sum(length(col("text"))).as("n_chars"))
  }

  /** Rejection sampling (best-of-n by a deterministic reward): group
    * assistant responses by their normalized prompt template (the
    * [[preferencePairs]] retry grouping — n candidates per re-asked
    * prompt), score each response with the corpus quality kernel
    * ([[TextOps.qualityColumns]] composite), keep the argmax. This is
    * the batch form of best-of-n sampling pipelines: candidates come
    * from retries instead of a sampler, the reward model is the
    * deterministic quality score instead of a learned RM (swap the
    * `reward` column for model scores and nothing else changes).
    *
    * Scale shape: [[sftPairs]]' conv-keyed window pass, then ONE
    * (conv_id, prompt_tpl)-keyed sort shared by row_number and the
    * group count — the same deliberately window-shaped (not
    * string-min_by) plan as [[preferencePairs]], so the projection
    * stays in whole-stage codegen. Ties broken by LAST turn (the
    * retry that ended the loop), made unique by turn_idx.
    */
  def rejectionSample(turns: DataFrame): DataFrame = {
    val reward = TextOps.qualityColumns(col("response"))
      .collectFirst { case ("quality_score", c) => c }.get
    val grp = Window.partitionBy(col("conv_id"), col("prompt_tpl"))
    val best = grp.orderBy(col("__reward").desc, col("turn_idx").desc)
    sftPairs(turns)
      .withColumn("prompt_tpl", turnTemplate(col("prompt")))
      .withColumn("__reward", reward)
      .withColumn("__rn", row_number().over(best))
      .withColumn("__n", count(lit(1)).over(grp))
      .filter(col("__rn") === 1)
      .select(col("conv_id"), col("prompt_tpl"),
        col("__n").as("n_candidates"),
        col("turn_idx").as("chosen_turn"),
        col("__reward").as("reward"),
        col("response_chars"))
  }

  /** The end-to-end conversation-curation pipeline in one plan:
    * [[transcriptGate]] (keep/drop per conversation) → keep filter →
    * [[renderChat]] (one training text per surviving conversation) →
    * exact dedup on the rendered digest (keep-first by conv_id). This is
    * the composition a production corpus build runs — each stage is
    * individually oracle-verified; this query verifies the composition.
    *
    * Scale shape: the gate emits conv-sized rows; the keep set joins back
    * to turns as a conv_id-keyed semi-join (co-partitioned with the
    * render aggregation's own conv_id shuffle — Catalyst reuses the
    * exchange); the final dedup is one shuffle on the 16-byte digest with
    * a per-group sort bounded by one text's duplicate count.
    */
  def curateConversations(turns: DataFrame): DataFrame = {
    val kept = transcriptGate(turns).filter(col("keep")).select("conv_id")
    val rendered = renderChat(turns.join(kept, Seq("conv_id"), "left_semi"))
    val byDigest = Window.partitionBy(col("digest")).orderBy(col("conv_id"))
    rendered
      .withColumn("__rn", row_number().over(byDigest))
      .filter(col("__rn") === 1)
      .select(col("conv_id"), col("n_turns"), col("n_chars"), col("digest"))
  }

  /** Deterministic training-order shuffle + sharding — the last step before
    * a trainer reads the corpus: a global pseudorandom permutation (order
    * key = md5 of the sample key, so the order is content-independent,
    * seedless, and identical on every engine and every rerun) cut into `k`
    * shards by the key's leading 16 bits mod k, with a dense 1-based
    * position within each shard. Hash-derived order destroys the corpus's
    * source/time locality — the "global shuffle" property trainers need so
    * consecutive batches are not topically correlated.
    *
    * Output: the input columns plus `order_key`, `shard`, `pos`. The `pos`
    * window partitions by shard — k partitions total, so at 10^12 samples
    * the materialized-pos form is for shard counts that keep n/k sortable
    * per task; [[writeTrainShards]] is the writer form (repartition on
    * shard + sort within partition), where file order carries the
    * permutation and `pos` need not materialize globally.
    */
  def trainOrderShards(samples: DataFrame, k: Int,
      keyCol: Column = col("conv_id")): DataFrame = {
    require(k > 0)
    val key = md5(concat(lit("ord:"), keyCol.cast("string")))
    val byShard = Window.partitionBy(col("shard"))
      .orderBy(col("order_key"), keyCol)
    samples
      .withColumn("order_key", key)
      .withColumn("shard",
        pmod(conv(substring(col("order_key"), 1, 4), 16, 10).cast("long"), lit(k.toLong)))
      .withColumn("pos", row_number().over(byShard))
  }

  /** Writer form of [[trainOrderShards]]: k-way repartition on the shard
    * id, permutation order carried by `sortWithinPartitions`, committed
    * through [[graft.sinks.GraftTable]] with hive-style `shard=` partition
    * directories — so the snapshot manifest records per-shard lineage +
    * row counts and `completedPartitions` makes a killed backfill resume
    * per shard.
    */
  def writeTrainShards(samples: DataFrame, k: Int, table: String,
      keyCol: Column = col("conv_id")): graft.sinks.GraftTable.Snapshot =
    graft.sinks.GraftTable.write(
      trainOrderShards(samples, k, keyCol)
        .repartition(k, col("shard"))
        .sortWithinPartitions(col("shard"), col("pos")),
      table, partitionCol = Some("shard"), stage = "train_shards")
}

"""Conversation (SFT) and preference-pair (RLHF) data operators.

The alignment-side tier of the training-data pipeline: after the corpus
operators (dedup / quality / mixture) produce a pretraining set, the
instruction-tuning stage works on CONVERSATIONS (ordered turns with
roles) and PREFERENCE PAIRS (chosen/rejected completions), and needs its
own structural validation, dedup and bias audits. The reference engine
(aws-samples/dbt-glue) has no chat layer — this module follows the same
extension discipline as ``web.py`` / ``text_analysis.py``: every
operator is built-in-Catalyst (no Python row UDFs), shuffles only on
bounded keys (conversation id, 16-byte unhexed-md5 response hashes;
output columns stay lowercase hex for oracle parity), and keeps all
ratio arithmetic exact (decimal(38,0) products, bigint quotients — the
bigmag contract).

Public grounding: turn-structure validation and suffix truncation are
the standard chat-template preprocessing steps (e.g. HuggingFace chat
templates / TRL SFTTrainer docs); response-level dedup mirrors document
exact-dedup (Lee et al. 2022) applied to assistant turns; preference
conflict detection and length-bias audits follow Ouyang et al. 2022
(InstructGPT, preference-data curation) and Singhal et al. 2023 ("A
Long Way to Go: Investigating Length Correlations in RLHF").

NULL contracts (stratified-family rules used module-wide):
- rows with a NULL conversation / pair key are excluded (they cannot be
  grouped deterministically);
- rows with a NULL turn index are excluded by the ordered operators
  (validate_turns, truncation_plan, and response_dedup's keeper
  tie-break): the two engines disagree on where NULL sorts (Spark ASC
  = NULLS FIRST, and a NULL struct field sorts first under min();
  DuckDB row_number ORDER BY puts NULLs last), so a NULL position has
  no engine-stable place in a conversation;
- NULL turn text counts as an EMPTY turn (0 tokens) for token math but
  flags ``n_empty_turns`` in validation;
- preference pairs where either side's text is NULL are excluded from
  hashing audits (md5(NULL) is NULL in both engines and would alias
  distinct damaged pairs together).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_glue_spark.functions.text import tokens


def _n_tokens(text_col: str) -> F.Column:
    """Whitespace token count; NULL text → 0 (empty turn)."""
    return F.size(tokens(F.coalesce(F.col(text_col), F.lit("")))).cast("bigint")


def validate_turns(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Per-conversation structural census for chat/SFT corpora.

    For each conversation (ordered by ``turn_col``) reports:

    - ``n_turns`` / ``n_user`` / ``n_assistant`` / ``n_system`` /
      ``n_other`` — role inventory (``n_other`` = any role not in the
      canonical three, including NULL);
    - ``starts_user`` — first NON-system turn is 'user' (a leading
      system prompt is legal);
    - ``ends_assistant`` — last turn is 'assistant' (a trailing user
      turn has no training signal);
    - ``n_alternation_breaks`` — adjacent non-system turns with the
      same role (null-safe comparison: two adjacent NULL-role turns
      count as a break too);
    - ``n_empty_turns`` — NULL or whitespace-only text;
    - ``n_misplaced_system`` — 'system' at any position other than the
      conversation's first turn;
    - ``well_formed`` — 1 iff all of the above are clean.

    100 TB shape: one lag window + per-group scalars, ALL partitioned by
    the conversation id, feeding one groupBy on the same key — a single
    shuffle, then |conversations| rows out. Conversations are
    short (tens of turns), so no per-group memory concern.
    """
    is_sys = F.coalesce(F.col("role") == "system", F.lit(False))
    base = df.filter(
        F.col(conv_col).isNotNull() & F.col(turn_col).isNotNull()
    ).select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
        _n_tokens(text_col).alias("__nt"),
        (
            F.col(text_col).isNull() | (F.trim(F.col(text_col)) == "")
        ).alias("__empty"),
    ).withColumn("__is_sys", is_sys)
    wg = Window.partitionBy("conv_id")
    # Previous role within the NON-system subsequence (system turns are
    # transparent to alternation). Implemented as last(non-system
    # struct, ignorenulls) over the preceding frame so EVERY window in
    # the operator partitions on conv_id alone — one exchange feeds the
    # ordered window, the per-group scalars and the final groupBy. The
    # struct wrapper distinguishes "no previous non-system turn"
    # (outer NULL) from "previous non-system turn had a NULL role"
    # (struct non-null, field NULL) — the oracle cross-checks with an
    # independent lag-over-subsequence formulation.
    w_prev = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rows = base.select(
        "*",
        F.min("turn_idx").over(wg).alias("__first_turn"),
        F.max("turn_idx").over(wg).alias("__last_turn"),
        F.min(F.when(~F.col("__is_sys"), F.col("turn_idx")))
        .over(wg)
        .alias("__first_nonsys_turn"),
        F.last(
            F.when(~F.col("__is_sys"), F.struct(F.col("role").alias("r"))),
            ignorenulls=True,
        )
        .over(w_prev)
        .alias("__prev"),
    )
    is_break = (
        ~F.col("__is_sys")
        & F.col("__prev").isNotNull()
        & F.col("role").eqNullSafe(F.col("__prev.r"))
    )
    agg = rows.groupBy("conv_id").agg(
        F.count("*").cast("bigint").alias("n_turns"),
        F.sum((F.col("role") == "user").cast("int")).cast("bigint").alias("n_user"),
        F.sum((F.col("role") == "assistant").cast("int"))
        .cast("bigint")
        .alias("n_assistant"),
        F.sum(F.col("__is_sys").cast("int")).cast("bigint").alias("n_system"),
        F.sum(
            (
                ~F.coalesce(
                    F.col("role").isin("user", "assistant", "system"), F.lit(False)
                )
            ).cast("int")
        )
        .cast("bigint")
        .alias("n_other"),
        F.max(
            F.when(F.col("turn_idx") == F.col("__last_turn"), F.col("role"))
        ).alias("__last_role"),
        F.max(
            F.when(
                (F.col("turn_idx") == F.col("__first_nonsys_turn"))
                & ~F.col("__is_sys"),
                F.col("role"),
            )
        ).alias("__first_nonsys_role"),
        F.sum(is_break.cast("int")).cast("bigint").alias("n_alternation_breaks"),
        F.sum(F.col("__empty").cast("int")).cast("bigint").alias("n_empty_turns"),
        F.sum(
            (F.col("__is_sys") & (F.col("turn_idx") != F.col("__first_turn"))).cast(
                "int"
            )
        )
        .cast("bigint")
        .alias("n_misplaced_system"),
        F.sum("__nt").cast("bigint").alias("n_tokens"),
    )
    starts_user = F.coalesce(
        (F.col("__first_nonsys_role") == "user").cast("int"), F.lit(0)
    )
    ends_assistant = F.coalesce(
        (F.col("__last_role") == "assistant").cast("int"), F.lit(0)
    )
    return agg.select(
        "conv_id",
        "n_turns",
        "n_user",
        "n_assistant",
        "n_system",
        "n_other",
        starts_user.alias("starts_user"),
        ends_assistant.alias("ends_assistant"),
        "n_alternation_breaks",
        "n_empty_turns",
        "n_misplaced_system",
        "n_tokens",
        (
            (starts_user == 1)
            & (ends_assistant == 1)
            & (F.col("n_alternation_breaks") == 0)
            & (F.col("n_empty_turns") == 0)
            & (F.col("n_misplaced_system") == 0)
            & (F.col("n_other") == 0)
        )
        .cast("int")
        .alias("well_formed"),
    )


def response_dedup(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    role: str = "assistant",
) -> DataFrame:
    """Exact dedup of ``role`` turns ACROSS conversations.

    Synthetic-data and scraped-chat corpora repeat assistant completions
    verbatim (template answers, refusals, canned intros); training on
    the repeats over-weights them exactly like document-level dups
    (Lee et al. 2022 applied at turn granularity). Returns the duplicate
    manifest — one row per response text occurring MORE THAN ONCE:
    (resp_hash, keep_conv, keep_turn, n_copies, n_convs); the keeper is
    the lexicographically first (conv, turn).

    100 TB shape: md5 hashing is map-side; ONE groupBy on the UNHEXED
    16-byte hash (half the shuffle-key width of the 32-char hex string;
    the output ``resp_hash`` is re-hexed lowercase for oracle parity)
    with map-side combine; the argmin rides min(struct(conv,turn)) so
    there is no window and no join-back. Output is bounded by the
    number of distinct duplicated responses. NULL text / NULL conv /
    NULL turn index excluded per the module contract (a NULL turn
    would win Spark's min(struct) tie-break but lose DuckDB's
    NULLS-LAST ordering — no engine-stable keeper).
    """
    resp = df.filter(
        (F.col(role_col) == role)
        & F.col(text_col).isNotNull()
        & F.col(conv_col).isNotNull()
        & F.col(turn_col).isNotNull()
    ).select(
        F.unhex(F.md5(F.col(text_col))).alias("__h"),
        F.struct(
            F.col(conv_col).alias("c"), F.col(turn_col).alias("t")
        ).alias("__k"),
    )
    agg = resp.groupBy("__h").agg(
        F.min("__k").alias("__keep"),
        F.count("*").cast("bigint").alias("n_copies"),
        F.count_distinct(F.col("__k.c")).cast("bigint").alias("n_convs"),
    )
    return agg.filter(F.col("n_copies") > 1).select(
        F.lower(F.hex("__h")).alias("resp_hash"),
        F.col("__keep.c").cast("bigint").alias("keep_conv"),
        F.col("__keep.t").cast("bigint").alias("keep_turn"),
        "n_copies",
        "n_convs",
    )


def truncation_plan(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    max_tokens: int = 2048,
) -> DataFrame:
    """Suffix truncation plan: the longest conversation suffix that fits
    in ``max_tokens`` AND starts at a user turn.

    Chat fine-tuning keeps the LATEST turns when a conversation exceeds
    the context window (the standard chat-template rule — early context
    is droppable, the final exchange is the label), and the kept window
    must open on a user turn so the first assistant turn in the window
    has its prompt. Per conversation returns: total sizes, the first
    kept turn (``-1`` when nothing fits), kept turn/token counts,
    ``loss_tokens`` (assistant tokens inside the kept window — the rows
    that actually receive loss), and ``truncated`` / ``dropped`` flags.

    100 TB shape: one ordered window (reverse cumulative token sum), one
    unordered per-group scalar and one groupBy — all keyed on the
    conversation id, so Spark plans a SINGLE exchange and reuses its
    partitioning across all three. Token math is exact bigint.
    """
    base = df.filter(
        F.col(conv_col).isNotNull() & F.col(turn_col).isNotNull()
    ).select(
        F.col(conv_col).alias("conv_id"),
        F.col(turn_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
        _n_tokens(text_col).alias("__nt"),
    )
    w_desc = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy("conv_id")
    rows = base.select(
        "*", F.sum("__nt").over(w_desc).alias("__suffix_tokens")
    ).select(
        "*",
        F.min(
            F.when(
                (F.col("__suffix_tokens") <= max_tokens)
                & (F.col("role") == "user"),
                F.col("turn_idx"),
            )
        )
        .over(wg)
        .alias("__first_kept"),
    )
    kept = F.col("turn_idx") >= F.col("__first_kept")
    agg = rows.groupBy("conv_id").agg(
        F.count("*").cast("bigint").alias("n_turns_total"),
        F.sum("__nt").cast("bigint").alias("tokens_total"),
        F.max("__first_kept").alias("__fk"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_turns_kept"),
        F.coalesce(F.sum(F.when(kept, F.col("__nt"))), F.lit(0))
        .cast("bigint")
        .alias("tokens_kept"),
        F.coalesce(
            F.sum(F.when(kept & (F.col("role") == "assistant"), F.col("__nt"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("loss_tokens"),
    )
    return agg.select(
        "conv_id",
        "n_turns_total",
        "tokens_total",
        F.coalesce(F.col("__fk"), F.lit(-1)).cast("bigint").alias("first_kept_turn"),
        "n_turns_kept",
        "tokens_kept",
        "loss_tokens",
        (F.col("n_turns_kept") < F.col("n_turns_total")).cast("int").alias("truncated"),
        (F.col("n_turns_kept") == 0).cast("int").alias("dropped"),
    )


def preference_pair_audit(
    df: DataFrame,
    pair_col: str = "pair_id",
    chosen_col: str = "chosen_text",
    rejected_col: str = "rejected_text",
) -> DataFrame:
    """Duplicate + conflict census over preference pairs.

    Two failure modes poison reward-model training (Ouyang et al. 2022
    curation): the same (chosen, rejected) content pair repeated
    verbatim (over-weights one comparison), and the same content pair
    appearing in BOTH orientations (A≻B and B≻A — contradictory labels,
    pure noise). Grouping on the UNORDERED md5 pair detects both at
    once. Returns one row per unordered content pair seen more than
    once OR conflicted: (pair_key, n_pairs, n_fwd, n_rev, conflict,
    keep_pair = min pair id, self_pair flag for chosen == rejected).

    Excluded per module contract: NULL pair id, NULL either text.
    100 TB shape: md5 is map-side; ONE groupBy on a true 32-BYTE
    unordered key (two unhexed 16-byte md5s concatenated — half the
    shuffle width of the hex form; binary least/greatest orders bytes
    exactly as hex least/greatest orders their lowercase digits, so the
    unordered pairing is unchanged and the output ``pair_key`` re-hexes
    to the oracle's lowercase hex) with map-side combine; output
    bounded by duplicated/conflicted pairs.
    """
    hashed = df.filter(
        F.col(pair_col).isNotNull()
        & F.col(chosen_col).isNotNull()
        & F.col(rejected_col).isNotNull()
    ).select(
        F.col(pair_col).alias("pair_id"),
        F.unhex(F.md5(F.col(chosen_col))).alias("__hc"),
        F.unhex(F.md5(F.col(rejected_col))).alias("__hr"),
    )
    keyed = hashed.select(
        "pair_id",
        F.concat(
            F.least("__hc", "__hr"), F.greatest("__hc", "__hr")
        ).alias("__pk"),
        (F.col("__hc") <= F.col("__hr")).cast("int").alias("__fwd"),
        (F.col("__hc") == F.col("__hr")).cast("int").alias("__self"),
    )
    agg = keyed.groupBy("__pk").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("__fwd").cast("bigint").alias("n_fwd"),
        F.sum(1 - F.col("__fwd")).cast("bigint").alias("n_rev"),
        F.min("pair_id").cast("bigint").alias("keep_pair"),
        F.max("__self").cast("int").alias("self_pair"),
    )
    return agg.select(
        F.lower(F.hex("__pk")).alias("pair_key"),
        "n_pairs",
        "n_fwd",
        "n_rev",
        ((F.col("n_fwd") > 0) & (F.col("n_rev") > 0)).cast("int").alias("conflict"),
        "keep_pair",
        "self_pair",
    ).filter((F.col("n_pairs") > 1) | (F.col("self_pair") == 1))


def preference_length_bias(
    df: DataFrame,
    group_col: str = "source",
    chosen_col: str = "chosen_text",
    rejected_col: str = "rejected_text",
) -> DataFrame:
    """Per-group length-bias audit for preference data.

    Reward models trained on pairs where the chosen side is
    systematically LONGER learn length, not quality (Singhal et al.
    2023) — this is the pre-training-time check. Per group returns:
    ``n_pairs``, token totals per side, ``chosen_longer_ppm`` /
    ``tie_ppm`` (exact ppm of pairs where the chosen side has more /
    equally many whitespace tokens), and ``mean_delta_micro`` — the
    mean (chosen − rejected) token delta in exact micro units, computed
    sign-separately so both engines' integer division (truncating vs
    flooring on negatives) agree: ``sign(Σδ) · (|Σδ|·10⁶ div n)``.

    NULL contract: NULL group excluded (stratified rule); a NULL text on
    either side counts that side as 0 tokens (the pair still exists and
    its length signal is real — a NULL completion IS shorter).

    100 TB shape: one codegen projection into one map-side-combining
    groupBy; output |groups|. Products ride decimal(38,0) (bigmag
    contract — Σδ·10⁶ would pass int64 at ~9e12 tokens of delta).
    """
    lc = _n_tokens(chosen_col)
    lr = _n_tokens(rejected_col)
    per = df.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        lc.alias("__lc"),
        lr.alias("__lr"),
    )
    agg = per.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("__lc").cast("bigint").alias("chosen_tokens"),
        F.sum("__lr").cast("bigint").alias("rejected_tokens"),
        F.sum((F.col("__lc") > F.col("__lr")).cast("int"))
        .cast("bigint")
        .alias("__n_longer"),
        F.sum((F.col("__lc") == F.col("__lr")).cast("int"))
        .cast("bigint")
        .alias("__n_tie"),
    )
    delta = F.col("chosen_tokens") - F.col("rejected_tokens")
    abs_mean = F.expr(
        "(CAST(abs(chosen_tokens - rejected_tokens) AS DECIMAL(38,0)) * 1000000)"
        " div n_pairs"
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_pairs",
        "chosen_tokens",
        "rejected_tokens",
        F.expr("(CAST(__n_longer AS DECIMAL(38,0)) * 1000000) div n_pairs")
        .cast("bigint")
        .alias("chosen_longer_ppm"),
        F.expr("(CAST(__n_tie AS DECIMAL(38,0)) * 1000000) div n_pairs")
        .cast("bigint")
        .alias("tie_ppm"),
        (
            F.when(delta < 0, F.lit(-1)).otherwise(F.lit(1)) * abs_mean
        )
        .cast("bigint")
        .alias("mean_delta_micro"),
    )


def render_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Chat-template rendering manifest: per conversation, the turns
    (ordered by ``turn_col``) concatenate into one training string of
    the form ``<|role|>\\ntext\\n`` per turn — the flattening step every
    SFT pipeline runs before tokenization (HuggingFace chat templates).
    To keep the catalog result bounded, the manifest carries the
    rendered string's md5 and sizes, not the string itself:
    (conv_id, n_turns, render_hash, n_chars, n_tokens).

    Determinism: the per-conversation concat rides
    ``array_join(transform(array_sort(collect_list(struct(turn, role,
    text)))))`` — the sort key is the turn index inside the collected
    struct, so the render is a pure function of the data, independent
    of partitioning (the collect_list order itself is not relied on).
    NULL role renders as the empty role tag; NULL text as the empty
    string; NULL conv/turn rows are excluded per the module contract.

    100 TB shape: ONE map-side-combining groupBy on the conversation
    id; the collected payload is one conversation's turns (bounded),
    and only (hash, counts) leave the aggregate.
    """
    base = df.filter(
        F.col(conv_col).isNotNull() & F.col(turn_col).isNotNull()
    ).select(
        F.col(conv_col).alias("conv_id"),
        F.struct(
            F.col(turn_col).alias("t"),
            F.coalesce(F.col(role_col), F.lit("")).alias("r"),
            F.coalesce(F.col(text_col), F.lit("")).alias("x"),
        ).alias("__turn"),
    )
    rendered = F.array_join(
        F.transform(
            F.array_sort(F.collect_list("__turn")),
            lambda s: F.concat(
                F.lit("<|"), s["r"], F.lit("|>\n"), s["x"], F.lit("\n")
            ),
        ),
        "",
    )
    return (
        base.groupBy("conv_id")
        .agg(
            F.count("*").cast("bigint").alias("n_turns"),
            rendered.alias("__render"),
        )
        .select(
            "conv_id",
            "n_turns",
            F.md5("__render").alias("render_hash"),
            F.length("__render").cast("bigint").alias("n_chars"),
            F.size(tokens(F.col("__render"))).cast("bigint").alias("n_tokens"),
        )
    )

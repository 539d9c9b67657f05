"""Unigram-LM (SentencePiece-style) tokenizer — the other production
tokenizer family next to BPE (Kudo 2018, "Subword Regularization";
sentencepiece's default trainer). Beyond-reference surface: a
training-data pipeline that ships tokenizers needs both families, and
their Spark shapes differ enough to be separate operators — BPE's unit
of work is the MERGE (a global argmax per rank), unigram's is the EM
ROUND (one full expected-count pass per iteration).

This implementation is HARD (Viterbi) EM, the deterministic variant:
the E-step segments every word type with the current piece log-probs
and counts the pieces of the single best segmentation; the M-step
re-estimates log-probs from those integer counts and prunes the
lowest-count pieces. Integer counts + a fixed tie-break make training
byte-reproducible — the property every other trainer in this engine
ships with (BPE's merge sequences, PQ's codebooks).

Scale shape (100 TB corpus):

* Everything trains on the WORD-TYPE table (``unigram_word_counts`` —
  one map-side-combined shuffle at distinct-word cardinality), never
  the corpus. The corpus is read exactly once.
* The seed inventory (``unigram_seed_vocab``) is one explode of all
  bounded-length substrings of the word table (<= ``max_piece_len`` x
  avg-len rows per word TYPE) into a groupBy at piece cardinality,
  then a distributed top-K (TakeOrderedAndProject) — no driver-side
  candidate generation.
* Each E-step is ONE Spark job: Arrow-batched ``mapInPandas`` over the
  word-type table with the current piece table in the task closure
  (the pq-codebook budget class: ~a few MB at a 4x-seeded 32k target),
  reduced by a groupBy at piece cardinality; the driver collects one
  row per surviving piece — vocabulary-bounded, never corpus- or
  word-bounded. Spark-job count is the prune schedule (~log(seed/
  target) / log(1/(1-prune_frac)) rounds x ``em_iters``), independent
  of corpus size.
* ``unigram_encode_documents_udf`` is MAP-ONLY over the corpus (the
  BPE-encode contract): Viterbi per word in Arrow-batched Python with
  the same bounded per-task word cache and output-frame token budget
  as the BPE encode UDF; no shuffle, no explode.
* ``unigram_decode_documents`` is map-only Catalyst: pieces only
  partition the marker-prefixed word, so decoding is join + marker ->
  space — no piece table needed (the bpe_decode argument).

Reference anchor: the engine's tokenizer gates follow
``spark-job/src/main/java/org/apache/cassandra/diff/DiffJob.java``-
style journaled determinism only in spirit — this module is entirely
beyond-reference surface.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_diff_spark.functions.text import words

#: SentencePiece word-boundary marker (U+2581 LOWER ONE EIGHTH BLOCK):
#: every word is encoded as MARKER + word, so any token stream decodes
#: unambiguously by mapping the marker back to a space. Words that
#: CONTAIN the literal marker are excluded from the tokenizer's domain
#: (the BPE marker-byte discipline — and the same exclusion runs in
#: every oracle).
WB_MARKER = "▁"

#: Default log-prob for an out-of-vocabulary SINGLE CHARACTER at encode
#: time. Training corpora always cover their own characters (single
#: chars are never pruned), but encode may see new text; an unknown
#: char becomes its own token at this floor probability instead of
#: failing the whole document.
UNK_LOGP = -20.0

#: Fail-fast ceiling for the driver-resident piece table (counts +
#: log-probs + the encode closure). 4M pieces is ~0.5 GB — far above
#: any real vocabulary (sentencepiece caps at ~1M), same discipline as
#: vocab.MAX_VOCAB_SIZE.
MAX_PIECE_TABLE = 4_000_000


def unigram_word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """``(word, cnt)`` corpus word frequencies with the boundary marker
    prepended — the word-TYPE table every training stage runs on. One
    explode + one map-side-combined aggregation; words containing the
    literal marker are dropped (domain exclusion, mirrored by oracles).
    """
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(words(F.col(text_col))).alias("w"))
        .filter((F.col("w") != "") & (~F.col("w").contains(WB_MARKER)))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(F.lit(WB_MARKER), F.col("w")).alias("word"), "cnt"
        )
    )


def unigram_seed_vocab(
    wc: DataFrame, *, max_piece_len: int = 8, seed_size: int = 32768
) -> DataFrame:
    """``(piece, score)`` seed inventory: every substring of length
    <= ``max_piece_len`` of every word (marker included), scored by the
    summed frequency of the words containing it (occurrence-
    multiplicity included — a substring appearing twice in one word
    scores twice, the cheap proxy sentencepiece's suffix-array seeding
    also uses). Single characters ALWAYS ride (coverage guarantee);
    the top ``seed_size`` multi-char pieces join them via a
    distributed ordered-limit. Shape: one explode at (word-type x
    substring) cardinality into a groupBy at piece cardinality — the
    corpus itself is never touched."""
    subs = wc.select(
        "cnt",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(int(max_piece_len)),
                                F.length("word") - i + 1,
                            ),
                        ),
                        lambda ln: F.col("word").substr(i, ln),
                    ),
                )
            )
        ).alias("piece"),
    )
    scored = subs.groupBy("piece").agg(F.sum("cnt").alias("score"))
    chars = scored.filter(F.length("piece") == 1)
    multi = (
        scored.filter(F.length("piece") > 1)
        .orderBy(F.col("score").desc(), "piece")
        .limit(int(seed_size))
    )
    return chars.unionByName(multi)


def _viterbi(
    word: str,
    logp: Dict[str, float],
    max_piece_len: int,
    unk_logp: float = UNK_LOGP,
) -> List[str]:
    """Single best segmentation of ``word`` under the unigram model —
    maximize the summed piece log-probs. Unknown single characters are
    admitted at ``unk_logp`` (their own token); unknown longer spans
    are not pieces. Tie-break: candidate last-piece lengths are
    scanned ascending and only a STRICTLY better score replaces the
    incumbent, so exact ties keep the shortest last piece —
    deterministic, and pinned by the brute-force property test."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        lo = max(0, j - int(max_piece_len))
        bj = NEG
        bi = -1
        for i in range(j - 1, lo - 1, -1):  # last-piece length ascending
            if best[i] == NEG:
                continue
            lp = logp.get(word[i:j])
            if lp is None:
                if j - i == 1:
                    lp = unk_logp
                else:
                    continue
            s = best[i] + lp
            if s > bj:
                bj = s
                bi = i
        best[j] = bj
        back[j] = bi
    if best[n] == NEG:  # unreachable: single chars always admissible
        return [word]
    out: List[str] = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def unigram_train(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 8192,
    *,
    max_piece_len: int = 8,
    seed_multiplier: int = 4,
    em_iters: int = 2,
    prune_frac: float = 0.25,
) -> List[Tuple[str, float]]:
    """Train a unigram tokenizer: returns ``[(piece, logp)]`` sorted by
    (final count DESC, piece ASC) — the piece inventory + log-probs the
    encode/decode pair consumes.

    Hard-EM schedule: seed ``seed_multiplier x vocab_size`` multi-char
    candidates (+ all single chars), then alternate ``em_iters``
    Viterbi-count E-steps with a prune that keeps the top multi-char
    pieces by (count DESC, piece ASC) — dropping ``prune_frac`` of the
    remainder, floored at the target — until the inventory reaches
    ``vocab_size``. Single characters are never pruned (coverage);
    zero-count survivors carry a half-count smoothing floor so their
    log-prob is defined. All counts are integers (word-frequency
    weighted), so the trained model is byte-reproducible.

    EAGER: runs its Spark jobs at call time and releases every frame it
    persists before returning (the auc_exact contract) — the returned
    model is a plain Python list, not a plan."""
    if vocab_size > MAX_PIECE_TABLE:
        raise ValueError(
            f"vocab_size {vocab_size} exceeds MAX_PIECE_TABLE "
            f"{MAX_PIECE_TABLE} — the driver-resident piece table bound"
        )
    wc = unigram_word_counts(df, text_col).persist()
    try:
        seed_size = int(vocab_size) * int(seed_multiplier)
        seed = unigram_seed_vocab(
            wc, max_piece_len=max_piece_len, seed_size=seed_size
        ).toArrow()
        counts: Dict[str, int] = dict(
            zip(
                seed.column("piece").to_pylist(),
                (int(s) for s in seed.column("score").to_pylist()),
            )
        )
        del seed
        chars = {p for p in counts if len(p) == 1}
        target_multi = max(int(vocab_size) - len(chars), 0)

        def _logp_of(cnts: Dict[str, int]) -> Dict[str, float]:
            # half-count floor keeps zero-count single chars defined
            total = sum(cnts.values()) or 1
            lt = math.log(total)
            return {
                p: (math.log(c) - lt if c > 0 else math.log(0.5) - lt)
                for p, c in cnts.items()
            }

        def _estep(cnts: Dict[str, int]) -> Dict[str, int]:
            logp = _logp_of(cnts)
            mpl = int(max_piece_len)

            def count_pieces(batches):
                import pandas as pd  # noqa: PLC0415

                acc: Dict[str, int] = {}
                for pdf in batches:
                    for w, c in zip(pdf["word"], pdf["cnt"]):
                        for piece in _viterbi(w, logp, mpl):
                            acc[piece] = acc.get(piece, 0) + int(c)
                if acc:
                    yield pd.DataFrame(
                        {
                            "piece": list(acc.keys()),
                            "c": pd.Series(
                                list(acc.values()), dtype="int64"
                            ),
                        }
                    )

            rows = (
                wc.mapInPandas(count_pieces, "piece string, c long")
                .groupBy("piece")
                .agg(F.sum("c").alias("c"))
                .toArrow()
            )
            got = dict(
                zip(
                    rows.column("piece").to_pylist(),
                    (int(x) for x in rows.column("c").to_pylist()),
                )
            )
            # retained pieces that won no segmentation keep count 0
            return {p: got.get(p, 0) for p in cnts}

        while True:
            for _ in range(max(int(em_iters), 1)):
                counts = _estep(counts)
            multi = sorted(
                ((p, c) for p, c in counts.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )
            if len(multi) <= target_multi:
                break
            keep_n = max(
                target_multi, int(len(multi) * (1.0 - float(prune_frac)))
            )
            if keep_n >= len(multi):  # prune_frac too small to move
                keep_n = target_multi
            counts = {p: counts[p] for p in chars}
            counts.update(dict(multi[:keep_n]))
        # settle probabilities on the FINAL inventory
        counts = _estep(counts)
        logp = _logp_of(counts)
        return [
            (p, logp[p])
            for p, _ in sorted(
                counts.items(), key=lambda pc: (-pc[1], pc[0])
            )
        ]
    finally:
        wc.unpersist()


#: Per-task encode bounds: same discipline (and same unit pricing —
#: one unit ~ 16 real bytes) as the BPE encode UDF's cache; see
#: vocab._BPE_CACHE_MAX_CHARS for the derivation and the r12
#: cache-hostile probe evidence.
_UNI_CACHE_MAX_ENTRIES = 262_144
_UNI_CACHE_MAX_CHARS = 8_000_000
_UNI_OUT_BATCH_TOKENS = 1_000_000


def unigram_encode_documents_udf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pieces: Sequence[Tuple[str, float]],
    *,
    cache_max_entries: int = _UNI_CACHE_MAX_ENTRIES,
    cache_max_chars: int = _UNI_CACHE_MAX_CHARS,
    out_batch_tokens: int = _UNI_OUT_BATCH_TOKENS,
    unk_logp: float = UNK_LOGP,
) -> DataFrame:
    """``(id, tokens array<string>, n_tokens)``: every document encoded
    by Viterbi segmentation under the trained unigram model — MAP-ONLY
    over the corpus (the BPE-encode contract: the piece table rides the
    task closure once, the token stream is never exploded or shuffled).
    Arrow-batched ``mapInPandas`` with the bounded per-task word cache
    (cleared wholesale at either cap — task memory constant in
    partition word cardinality) and the output-frame token budget
    (flush mid-batch past ``out_batch_tokens`` — a batch of token-heavy
    documents cannot build a multi-GB frame). Unknown characters become
    their own token at ``unk_logp``; words containing the literal
    boundary marker are dropped (domain exclusion, mirrored in
    oracles)."""
    import re as _re

    import pandas as pd

    logp: Dict[str, float] = {}
    for p, lp in pieces:
        logp.setdefault(p, float(lp))
    mpl = max((len(p) for p in logp), default=1)
    out_schema = (
        f"id {dict(df.dtypes)[id_col]}, tokens array<string>, n_tokens long"
    )
    ws_re = _re.compile(r"\s+", _re.ASCII)  # the words() tokenizer
    cap_entries = int(cache_max_entries)
    cap_chars = int(cache_max_chars)
    cap_out = int(out_batch_tokens)
    unk = float(unk_logp)

    def _encode(batches):
        cache: Dict[str, List[str]] = {}
        cache_chars = 0

        def _frame(ids, toks_col, n_col):
            return pd.DataFrame(
                {
                    "id": ids,
                    "tokens": pd.Series(toks_col, dtype="object"),
                    "n_tokens": pd.Series(n_col, dtype="int64"),
                }
            )

        for pdf in batches:
            ids, toks_col, n_col = [], [], []
            out_toks = 0
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue
                toks: List[str] = []
                for w in ws_re.split(t):
                    if not w or WB_MARKER in w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = _viterbi(WB_MARKER + w, logp, mpl, unk)
                        if (
                            len(cache) >= cap_entries
                            or cache_chars > cap_chars
                        ):
                            cache.clear()
                            cache_chars = 0
                        cache[w] = got
                        cache_chars += len(w) + 8 * len(got)
                    toks.extend(got)
                ids.append(i)
                toks_col.append(toks)
                n_col.append(len(toks))
                out_toks += len(toks)
                if out_toks >= cap_out:
                    yield _frame(ids, toks_col, n_col)
                    ids, toks_col, n_col = [], [], []
                    out_toks = 0
            if not ids:
                continue  # all-null batch (the Arrow list-type guard)
            yield _frame(ids, toks_col, n_col)

    return df.select(id_col, text_col).mapInPandas(_encode, out_schema)


def unigram_decode_documents(
    df: DataFrame, id_col: str = "id", tokens_col: str = "tokens"
) -> DataFrame:
    """``(id, text)``: the inverse of the encode — pieces only ever
    PARTITION the marker-prefixed word (Viterbi segments, never
    rewrites), so decoding needs no piece table: join the tokens and
    turn each boundary marker into a space. Map-only, pure Catalyst
    string expressions; returns the whitespace-NORMALIZED text
    (``decode(encode(x)) == ' '.join(words(x))`` — the round-trip a
    tokenizer ships with, same contract as bpe_decode_documents)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.trim(
            F.replace(
                F.array_join(F.col(tokens_col), ""),
                F.lit(WB_MARKER),
                F.lit(" "),
            )
        ).alias("text"),
    )

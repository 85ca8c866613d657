"""Regex search over the corpus — literal-factor prefilter + trigram
index seek (the Google-Code-Search / Zoekt shape, re-expressed in
Spark).

The reference's query language reaches content-level patterns only
through LIKE markers on identifiers (reiz/ir/backends/edgeql.py:105-108
compiles `f"prefix%"` to a LIKE over the dictionary); a grep-grade
regex over raw sources is the canonical remaining fulltext-index-tier
capability. Two tiers, one analyzer:

1. **Factor analysis** (`analyze`): walk the stdlib regex AST
   (`re._parser`) and emit a DNF of REQUIRED literal factors — strings
   that must appear in any match. Concatenation is AND (cross-product,
   capped), alternation is OR (an unconstrained branch poisons the
   whole OR), `x*`/`x?` contribute nothing, `x+` contributes x's
   factors, classes/dot/anchors/lookarounds/backrefs contribute
   nothing (conservative = never drops a true match). Returns None
   when nothing usable survives -> full-scan fallback.

2. **One-shot path** (`regex_search`): factors become JVM
   `Contains(text, lit)` conjunctions under an OR — predicates Spark
   pushes into the parquet scan (row-group skipping via min/max is
   content-dependent, but the verify-stage `rlike` then runs on the
   surviving fraction only, keeping the expensive Java-regex engine
   off the hot path). The whole plan is WholeStageCodegen; zero
   Python.

3. **Index-seek path** (`build_trigram_index` + `grep_index`): a
   persistent trigram sidecar over the code index's content table —
   posting lists of distinct content byte-trigrams (packed big-endian
   into a long: int keys shuffle, join, and push down far cheaper than
   3-char strings at 10^10 postings), salted into <=
   TG_FRAGMENT-posting fragments (same Zipf-hot-key defense as the
   main build: 'def'/'    ' appear in ~every source file), written
   partitioned by pmod(xxhash64(tg), N_TG_BUCKETS) so a query reads
   ONLY its trigrams' buckets (partition pruning, the blocks-table
   discipline). Query: per DNF alternative pick the R rarest trigrams
   by df (driver-side dictionary lookup, broadcast-sized), decode
   their postings (delta+varint, functions/codec.py), intersect by
   count, union alternatives, then rlike-verify just the candidates'
   content. A trigram absent from the dictionary proves the
   alternative matches nothing — the seek can answer "0 rows" without
   touching content at all.

At 100 TB: the sidecar build is one extra shuffle over content (same
salting bound as the main index build); a selective query decodes a
few fragments (MB, not TB) and verifies a candidate set proportional
to the rarest-trigram df — the regex engine never sees the corpus.
"""

from __future__ import annotations

import json
import os
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # Python 3.11+: the sre internals live under re.*
    from re import _constants as _sre_c
    from re import _parser as _sre_parse
except ImportError:  # pragma: no cover - older CPython
    import sre_constants as _sre_c
    import sre_parse as _sre_parse

import re

MIN_FACTOR_LEN = 3  # a factor shorter than a trigram can't seed the index
_MAX_ALTS = 24  # DNF width cap: AND overflow relaxes, OR overflow -> None

N_TG_BUCKETS = 32
TG_FRAGMENT = 262_144  # target postings per salted fragment (as build.py)


# --------------------------------------------------------------------------
# factor analysis
# --------------------------------------------------------------------------

def _and(d1, d2):
    """AND of two DNFs. None = unconstrained (identity). On width
    overflow DROPPING one side is a pure relaxation (the result stays a
    necessary condition), so keep the narrower operand."""
    if d1 is None:
        return d2
    if d2 is None:
        return d1
    cross = {a | b for a in d1 for b in d2}
    if len(cross) > _MAX_ALTS:
        return d1 if len(d1) <= len(d2) else d2
    return list(cross)


def _or(dnfs):
    """OR of child DNFs. Any unconstrained branch (None, or an
    alternative with zero factors) means a match may satisfy the regex
    through that branch with no literal evidence -> None. Dropping an
    alternative would STRENGTHEN the filter (could miss matches), so
    width overflow also degrades to None."""
    out = []
    for d in dnfs:
        if d is None:
            return None
        out.extend(d)
    if any(len(alt) == 0 for alt in out) or len(out) > _MAX_ALTS:
        return None
    return out


def _analyze_seq(tokens, min_len: int):
    dnf = [frozenset()]  # AND identity with zero factors so far
    run: list[str] = []

    def flush():
        nonlocal dnf
        if len(run) >= min_len:
            dnf = _and(dnf, [frozenset(["".join(run)])])
        run.clear()

    for op, av in tokens:
        if op is _sre_c.LITERAL:
            run.append(chr(av))
            continue
        flush()
        if op is _sre_c.SUBPATTERN:
            # av = (group, add_flags, del_flags, subpattern); inline
            # flag changes (e.g. (?i:...)) alter matching inside ->
            # conservative: no constraint from that group
            if av[1] == 0 and av[2] == 0:
                dnf = _and(dnf, _analyze_seq(av[3], min_len))
        elif op is getattr(_sre_c, "ATOMIC_GROUP", object()):
            dnf = _and(dnf, _analyze_seq(av, min_len))
        elif op is _sre_c.BRANCH:
            dnf = _and(
                dnf, _or([_analyze_seq(b, min_len) for b in av[1]])
            )
        elif op in (
            _sre_c.MAX_REPEAT,
            _sre_c.MIN_REPEAT,
            getattr(_sre_c, "POSSESSIVE_REPEAT", object()),
        ):
            lo, _hi, item = av
            if lo >= 1:  # at least one occurrence -> its factors appear
                dnf = _and(dnf, _analyze_seq(item, min_len))
        # IN / ANY / AT / NOT_LITERAL / GROUPREF / ASSERT / ASSERT_NOT
        # and anything unrecognized: contributes no constraint, but the
        # factors of the surrounding concatenation remain required.
    flush()
    return dnf


def analyze(
    pattern: str, min_len: int = MIN_FACTOR_LEN
) -> tuple[list[frozenset[str]] | None, bool]:
    """Required-literal-factor DNF for ``pattern`` plus a fold-case
    flag. Returns (None, fold) when no usable constraint exists (the
    caller must full-scan). Guarantee: every string matched by the
    pattern contains, for at least one alternative, every factor in it
    (case-folded when fold is True)."""
    try:
        parsed = _sre_parse.parse(pattern)
    except re.error:
        raise
    fold = bool(parsed.state.flags & re.IGNORECASE)
    dnf = _analyze_seq(parsed, min_len)
    if dnf is not None:
        dnf = [alt for alt in dnf]
        if any(len(alt) == 0 for alt in dnf) or not dnf:
            dnf = None
    if dnf is not None and fold:
        dnf = [frozenset(f.lower() for f in alt) for alt in dnf]
    return dnf, fold


def trigrams_of(factor: str) -> list[int]:
    """Byte trigrams of a factor, packed big-endian into one int (the
    sidecar's key type: a long shuffles, joins, and pushes down far
    cheaper than a 3-char string at 10^10 postings). Byte-level is
    consistent between build and query for any UTF-8 content: if the
    factor's chars appear in the content, the factor's bytes appear in
    the content bytes."""
    b = factor.encode("utf-8")
    return [int.from_bytes(b[i : i + 3], "big") for i in range(len(b) - 2)]


def _case_variants(tg: int) -> tuple[int, ...]:
    """All ASCII case variants of a packed (folded) trigram, <= 8.
    The caseless-grep group: a doc matches a caseless factor only if,
    for each of the factor's lowercase trigrams, it holds AT LEAST ONE
    of these variants (the Zoekt trick — the sidecar stays single-case,
    the query side expands). Sound for ASCII only; callers must fall
    back to the verify scan when a folded factor has non-ASCII bytes."""
    opts = []
    for shift in (16, 8, 0):
        b = (tg >> shift) & 0xFF
        if 0x61 <= b <= 0x7A:  # a-z -> {lower, upper}
            opts.append((b, b - 32))
        elif 0x41 <= b <= 0x5A:  # A-Z (defensive; input is folded)
            opts.append((b + 32, b))
        else:
            opts.append((b,))
    return tuple(
        sorted(
            (a << 16) | (b << 8) | c
            for a in opts[0]
            for b in opts[1]
            for c in opts[2]
        )
    )


# --------------------------------------------------------------------------
# one-shot path (documents-table tier; DuckDB-oracle-checkable)
# --------------------------------------------------------------------------

def regex_search(
    documents: DataFrame,
    pattern: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Docs whose text matches ``pattern`` (Java-regex find semantics,
    = RE2 partial match for the shared syntax subset), with the
    leftmost-non-overlapping match count. Required literal factors run
    first as JVM Contains conjunctions — the rlike verify only sees
    rows that passed the factor prefilter (on a no-factor pattern the
    plan degrades to the brute scan, still all-JVM)."""
    from .fulltext import spread_parallelism

    dnf, fold = analyze(pattern)
    text = F.col(text_col)
    probe = F.lower(text) if fold else text
    df = spread_parallelism(documents)
    if dnf is not None:
        df = df.filter(
            reduce(
                lambda a, b: a | b,
                (
                    reduce(
                        lambda a, b: a & b,
                        (probe.contains(f) for f in sorted(alt)),
                    )
                    for alt in dnf
                ),
            )
        )
    return df.filter(text.rlike(pattern)).select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).alias(
            "n_matches"
        ),
    )


def regex_search_sql(pattern: str) -> str:
    """DuckDB twin: RE2 partial-match + leftmost-non-overlapping
    extract_all — identical semantics to the Spark side for the
    engine-portable syntax subset the entries use."""
    p = pattern.replace("'", "''")
    return (
        f"SELECT doc_id, len(regexp_extract_all(text, '{p}')) AS n_matches"
        f" FROM documents WHERE regexp_matches(text, '{p}')"
        f" ORDER BY doc_id"
    )


# --------------------------------------------------------------------------
# persistent trigram sidecar over the code index's content table
# --------------------------------------------------------------------------

class StaleTrigramIndex(RuntimeError):
    """The sidecar was built against a different index snapshot."""


class ConcurrentSidecarUpdate(RuntimeError):
    """Another build/update holds the sidecar lock."""


def _tg_paths(index_dir: str) -> dict[str, str]:
    base = os.path.join(index_dir, "trigrams")
    return {
        "base": base,
        "meta": os.path.join(base, "meta.json"),
        "lock": os.path.join(base, "update.lock"),
    }


def _gen_postings(base: str, gen: str) -> str:
    return os.path.join(base, gen, "postings")


def _gen_dictionary(base: str, gen: str) -> str:
    return os.path.join(base, gen, "dictionary")


def _read_postings(
    spark: SparkSession, base: str, gens: list[str]
) -> DataFrame:
    """Union of the generations' posting tables. One scan per
    generation (multi-root reads trip Spark's partition discovery);
    bucket partition filters and tg pushdown apply to each branch, and
    generations hold disjoint doc sets so plain union is the merge."""
    reads = [
        spark.read.schema(
            "tg long, salt int, first_doc_id long, n_docs long, "
            "doc_deltas binary, bucket int"
        ).parquet(_gen_postings(base, g))
        for g in gens
    ]
    return reduce(lambda a, b: a.unionByName(b), reads)


def _content_batches(index_dir: str) -> list[str]:
    """batch ids present in the content table's hive layout."""
    try:
        names = os.listdir(os.path.join(index_dir, "content"))
    except OSError:
        return []
    return sorted(
        n.split("=", 1)[1] for n in names if n.startswith("batch=")
    )


def _write_tg_meta(p: dict[str, str], tmeta: dict) -> None:
    tmp = p["meta"] + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(tmeta, fh)
    os.replace(tmp, p["meta"])
    _drop_caches_for(p["base"])


def _sidecar_lock(p: dict[str, str]):
    os.makedirs(p["base"], exist_ok=True)
    try:
        fd = os.open(p["lock"], os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        raise ConcurrentSidecarUpdate(
            f"sidecar build/update already in progress ({p['lock']} "
            "held); retry when it completes, or remove the lock if its "
            "owner crashed"
        ) from None


def build_trigram_index(spark: SparkSession, index_dir: str) -> dict:
    """Build the trigram sidecar for a committed code index. Sidecar,
    not snapshot member: it lives under <index>/trigrams/ with its own
    atomically-replaced meta.json recording the index version it was
    built from — the main commit/merge/time-travel discipline
    (build.py:_write_meta_atomic) is untouched, and grep_index refuses
    a version mismatch instead of silently missing newly merged docs.

    Commit discipline (the ANN-segment shape, ann_index.py): postings
    and dictionary land in a generation dir no reader references
    (gen-00000 here); meta.json is flipped atomically afterwards.
    REFUSES a dir with a committed sidecar — after an incremental
    index merge call update_trigram_index, which appends a generation
    covering ONLY the new batches. An O_EXCL lock serializes writers.

    Shape: content -> distinct packed byte-trigrams per doc (numpy) ->
    df per trigram -> salt = pmod(xxhash64(doc_id), ceil(df /
    TG_FRAGMENT)) so no task ever owns a whole hot trigram's postings
    -> per (tg, salt) sorted doc_id fragments, delta+varint encoded
    (functions/codec.py), partitioned by pmod(xxhash64(tg),
    N_TG_BUCKETS)."""
    p = _tg_paths(index_dir)
    if os.path.exists(p["meta"]):
        raise RuntimeError(
            f"{p['base']} already holds a committed sidecar — an "
            "in-place rebuild would tear concurrent readers. Use "
            "update_trigram_index to fold in new batches, or remove "
            "the trigrams dir for a from-scratch rebuild."
        )
    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    batches = _content_batches(index_dir)
    _sidecar_lock(p)
    try:
        gen = "gen-00000"
        n_frags = _build_generation(spark, index_dir, gen, batches)
        tmeta = {
            "format": 2,
            "commit": 1,
            "index_version": meta.get("version"),
            "n_term_buckets": N_TG_BUCKETS,
            "generations": [gen] if n_frags else [],
            "covered_batches": batches,
        }
        _write_tg_meta(p, tmeta)
    finally:
        try:
            os.remove(p["lock"])
        except OSError:
            pass
    return tmeta


def update_trigram_index(spark: SparkSession, index_dir: str) -> dict:
    """Fold the content batches added since the sidecar's last commit
    into a NEW generation — cost ∝ new-batch size; committed
    generations are never read or moved (the ANN append contract).
    Doc_ids are disjoint across batches (the main build's cross-batch
    anti-join, build.py:144-170), so a trigram's postings are simply
    the union of its fragments across generations; the merged
    dictionary df is the per-generation sum. A crash before the meta
    flip leaves readers on the previous snapshot (the orphan
    generation dir is invisible). No new batches -> the commit just
    revalidates index_version (e.g. after a metadata-only change)."""
    p = _tg_paths(index_dir)
    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    _sidecar_lock(p)
    try:
        with open(p["meta"]) as fh:
            tmeta = json.load(fh)
        covered = set(tmeta.get("covered_batches", []))
        on_disk = _content_batches(index_dir)
        gone = covered - set(on_disk)
        if gone:
            raise RuntimeError(
                f"content batches {sorted(gone)} covered by the sidecar "
                "no longer exist (content was compacted/rewritten) — "
                "remove the trigrams dir and rebuild from scratch"
            )
        new = [b for b in on_disk if b not in covered]
        if new:
            gens = tmeta.get("generations", [])
            nums = [int(g.split("-")[1]) for g in gens]
            gen = f"gen-{(max(nums) + 1 if nums else 0):05d}"
            n_frags = _build_generation(spark, index_dir, gen, new)
            if n_frags:
                tmeta["generations"] = gens + [gen]
        elif tmeta.get("index_version") == meta.get("version"):
            return tmeta  # nothing to do
        tmeta["covered_batches"] = sorted(covered | set(new))
        tmeta["index_version"] = meta.get("version")
        tmeta["commit"] = int(tmeta.get("commit", 1)) + 1
        _write_tg_meta(p, tmeta)
    finally:
        try:
            os.remove(p["lock"])
        except OSError:
            pass
    return tmeta


def _build_generation(
    spark: SparkSession, index_dir: str, gen: str, batches: list[str]
) -> int:
    """Encode the given content batches into <trigrams>/<gen>/
    (postings + dictionary). Returns the number of posting fragments
    written (0 = empty input; the caller skips committing the
    generation)."""
    from ..schema import CONTENT_ON_DISK

    p = _tg_paths(index_dir)
    content = (
        spark.read.schema(CONTENT_ON_DISK)
        .parquet(os.path.join(index_dir, "content"))
        .filter(F.col("batch").isin(batches))  # partition-pruned
    )

    def _doc_trigrams(pdf_iter):
        # distinct packed byte trigrams per doc — numpy shift/or over
        # the raw UTF-8 bytes (a JVM sequence+transform+substr built
        # ~len(content) string objects per row and measured 10x slower).
        # Emitted as ONE ARRAY ROW PER DOC, not exploded rows: shipping
        # ~500 tg/doc as individual Arrow rows out of Python was the
        # single biggest cost of the sidecar build (r8 probe: 17 s of a
        # 26 s build for 94M rows at 200k files); array batches carry
        # the same longs at a fraction of the per-element overhead and
        # the explode happens JVM-side (codegen Generate).
        for pdf in pdf_iter:
            ids, tgs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["content"]):
                b = text.encode("utf-8")
                if len(b) < 3:
                    continue
                a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                ids.append(doc_id)
                tgs.append(np.unique(
                    (a[:-2] << 16) | (a[1:-1] << 8) | a[2:]
                ))
            yield pd.DataFrame({"doc_id": ids, "tgs": tgs})

    # persist the ARRAY rows (one per doc): both the dictionary agg
    # and the fragment encode consume them, so the Python extraction
    # runs once — and the blocks are unpersisted DETERMINISTICALLY at
    # the end of this function instead of lingering until a GC cycle
    # (a lazy localCheckpoint's blocks survive the build and tax every
    # later job's heap). (The r6 finding that caching was 2.5x slower
    # applied to the EXPLODED row cache — 10^8 JVM row objects; the
    # array form is ~500x fewer rows.)
    arrs = content.select("doc_id", "content").mapInPandas(
        _doc_trigrams, schema="doc_id long, tgs array<long>"
    ).persist()
    posts = arrs.select("doc_id", F.explode("tgs").alias("tg"))
    df_per_tg = posts.groupBy("tg").agg(F.count("*").alias("df"))
    df_per_tg.write.mode("overwrite").parquet(
        _gen_dictionary(p["base"], gen)
    )
    # hot-map broadcast, the main build's _hot_map shape: only trigrams
    # needing >1 fragment (the Zipf head — 'def ', whitespace runs; a
    # few thousand keys) ship to the executors, instead of the FULL
    # per-generation dictionary (up to 16.7M rows, a per-task
    # deserialization bill that grew with cores in the r6 cells).
    hot = (
        spark.read.schema("tg long, df long")
        .parquet(_gen_dictionary(p["base"], gen))
        .filter(F.col("df") > TG_FRAGMENT)
        .select(
            "tg",
            F.ceil(F.col("df") / F.lit(TG_FRAGMENT))
            .cast("int").alias("n_salts"),
        )
    )
    salted = posts.join(F.broadcast(hot), "tg", "left").withColumn(
        "salt",
        F.when(F.col("n_salts").isNull(), F.lit(0))
        .otherwise(F.pmod(F.xxhash64("doc_id"), F.col("n_salts")))
        .cast("int"),
    )
    frags = salted.groupBy("tg", "salt").agg(
        F.sort_array(F.collect_list("doc_id")).alias("doc_ids")
    )

    def _encode(pdf_iter):
        from ..functions import codec

        for pdf in pdf_iter:
            rows = {
                "tg": [], "salt": [], "first_doc_id": [], "n_docs": [],
                "doc_deltas": [], "bucket": [],
            }
            for tg, salt, ids in zip(
                pdf["tg"], pdf["salt"], pdf["doc_ids"]
            ):
                arr = np.asarray(ids, dtype=np.int64)
                rows["tg"].append(int(tg))
                rows["salt"].append(int(salt))
                rows["first_doc_id"].append(int(arr[0]))
                rows["n_docs"].append(len(arr))
                rows["doc_deltas"].append(codec.delta_encode_docids(arr))
                rows["bucket"].append(_tg_bucket(tg))
            yield pd.DataFrame(rows)

    encoded = frags.mapInPandas(
        _encode,
        schema=(
            "tg long, salt int, first_doc_id long, n_docs long, "
            "doc_deltas binary, bucket int"
        ),
    )
    (
        encoded.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(_gen_postings(p["base"], gen))
    )
    arrs.unpersist()  # both consumers are done — free the blocks NOW
    # explicit schema: an empty input writes a part-file-less dir whose
    # schema can't be inferred (the ANN append lesson, ann_index.py)
    return (
        spark.read.schema(
            "tg long, salt int, first_doc_id long, n_docs long, "
            "doc_deltas binary, bucket int"
        )
        .parquet(_gen_postings(p["base"], gen))
        .count()
    )


def _tg_bucket(tg: int) -> int:
    """Bucket of a packed trigram. Only build/query consistency matters
    (both call THIS function; Spark never hashes tg), xxhash64 for
    uniformity — packed ASCII trigrams are far from uniform themselves."""
    from ..functions.hashing import spark_xxhash64

    return spark_xxhash64(tg) % N_TG_BUCKETS


R_TRIGRAMS_PER_ALT = 3  # intersect the R rarest trigrams per alternative

# warm per-process dictionary cache: (sidecar base, commit) ->
# (sorted tg array, merged df array). Scale-safe to hold driver-side
# at ANY corpus size: byte trigrams are bounded by 256^3 = 16.7M
# entries (~270 MB as two numpy arrays at the absolute ceiling; real
# code corpora sit around 100-500k), unlike the term dictionary,
# which grows with the corpus.
_DICT_CACHE: dict[tuple[str, object], tuple[np.ndarray, np.ndarray]] = {}


def _load_dictionary(
    spark: SparkSession, paths: dict[str, str], tmeta: dict
) -> tuple[np.ndarray, np.ndarray]:
    key = (paths["base"], tmeta.get("commit"))
    if key not in _DICT_CACHE:
        gens = tmeta.get("generations", [])
        if not gens:
            empty = np.empty(0, dtype=np.int64)
            _DICT_CACHE[key] = (empty, empty)
            return _DICT_CACHE[key]
        # merged df across generations (disjoint doc sets -> sum)
        pdf = (
            spark.read.schema("tg long, df long")
            .parquet(*[_gen_dictionary(paths["base"], g) for g in gens])
            .groupBy("tg")
            .agg(F.sum("df").alias("df"))
            .toPandas()
        )
        tgs = pdf["tg"].to_numpy(dtype=np.int64)
        dfs = pdf["df"].to_numpy(dtype=np.int64)
        order = np.argsort(tgs)
        _DICT_CACHE[key] = (tgs[order], dfs[order])
    return _DICT_CACHE[key]


# warm per-process posting-list cache for the driver-decode path:
# (sidecar base, commit, tg) -> sorted doc_id array. Byte-budgeted LRU
# (an entry is at most driver_decode_max postings; the budget keeps
# the total bounded regardless) — the serving tier's analog of
# IndexReader.warm: repeat/overlapping queries skip the fragment read
# entirely.
_POSTING_CACHE: "dict[tuple, np.ndarray]" = {}
_POSTING_CACHE_BYTES = 256 << 20


def _posting_cache_put(key: tuple, arr: np.ndarray) -> None:
    _POSTING_CACHE[key] = arr
    total = sum(a.nbytes for a in _POSTING_CACHE.values())
    while total > _POSTING_CACHE_BYTES and len(_POSTING_CACHE) > 1:
        oldest = next(iter(_POSTING_CACHE))  # insertion-order eviction
        total -= _POSTING_CACHE.pop(oldest).nbytes


def _drop_caches_for(base: str) -> None:
    for cache in (_DICT_CACHE, _POSTING_CACHE):
        for key in [k for k in cache if k[0] == base]:
            del cache[key]


def _df_lookup(
    tg_sorted: np.ndarray, dfs: np.ndarray, tgs: list[int]
) -> dict[int, int]:
    """df of each queried trigram (absent -> missing from the result)."""
    if tg_sorted.size == 0:
        return {}
    q = np.asarray(tgs, dtype=np.int64)
    pos = np.searchsorted(tg_sorted, q)
    ok = (pos < tg_sorted.size) & (tg_sorted[np.minimum(pos, tg_sorted.size - 1)] == q)
    return {int(t): int(dfs[p]) for t, p, o in zip(q, pos, ok) if o}


DRIVER_DECODE_MAX = 2 << 20  # <=2M postings (~16 MB) decode driver-side
ISIN_CAND_MAX = 10_000  # candidate sets this small push down as IN filters
# seek-vs-scan routing: when the rarest-trigram df bound says candidates
# exceed this fraction of the corpus, skip the posting seek and verify
# over the factor-prefiltered scan instead (max'd with ISIN_CAND_MAX so
# the rule only binds at scale)
GREP_SEEK_MAX_FRACTION = 0.02


def grep_index(
    spark: SparkSession,
    index_dir: str,
    pattern: str,
    allow_stale: bool = False,
    driver_decode_max: int = DRIVER_DECODE_MAX,
) -> DataFrame:
    """Regex search over an indexed corpus via the trigram sidecar.
    Per DNF alternative: look up candidate trigrams' df in the warm
    dictionary cache (driver-side; bounded by 256^3 entries at ANY
    corpus size), keep the R rarest, then read only their posting
    fragments (bucket partition pruning + tg predicate pushdown).
    Selective queries (dictionary-known total postings <=
    ``driver_decode_max``) decode + intersect driver-side in numpy and
    broadcast the candidate list — one Spark job end-to-end; hot
    queries keep the distributed decode/intersect. Either way the
    rlike verify sees candidates only. Caseless patterns expand each
    folded trigram into its <=8 ASCII case variants (one variant per
    group must be present — the sidecar stays single-case). Falls back
    to the full content scan when the pattern yields no factors (or a
    caseless factor has non-ASCII bytes). Returns
    (doc_id, repo, path, n_matches)."""
    cand, docs = _candidate_content(
        spark, index_dir, pattern, allow_stale, driver_decode_max
    )
    if cand is None:
        return (
            docs.select("doc_id", "repo", "path")
            .withColumn("n_matches", F.lit(0))
            .limit(0)
        )
    return _verify_and_render(cand, docs, pattern)


def grep_lines(
    spark: SparkSession,
    index_dir: str,
    pattern: str,
    allow_stale: bool = False,
    driver_decode_max: int = DRIVER_DECODE_MAX,
) -> DataFrame:
    """``grep -n``: one row per MATCHING LINE with its 1-based line
    number — the pattern is applied line-at-a-time (it cannot span
    lines), grep's contract. Shares grep_index's sidecar candidate
    seek (sound: a matching line lives inside its doc, so the doc
    holds every required factor), then posexplodes ONLY the surviving
    candidates' content into lines for the per-line rlike — all JVM.
    Returns (doc_id, repo, path, lineno, line)."""
    cand, docs = _candidate_content(
        spark, index_dir, pattern, allow_stale, driver_decode_max
    )
    meta = docs.select("doc_id", "repo", "path")
    if cand is None:
        return (
            meta.withColumn("lineno", F.lit(0).cast("int"))
            .withColumn("line", F.lit(""))
            .limit(0)
        )
    return (
        cand.select(
            "doc_id",
            F.posexplode(F.split(F.col("content"), "\n")).alias(
                "pos", "line"
            ),
        )
        .filter(F.col("line").rlike(pattern))
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("int").alias("lineno"),
            "line",
        )
        .join(meta, "doc_id")
        .select("doc_id", "repo", "path", "lineno", "line")
    )


def _candidate_content(
    spark: SparkSession,
    index_dir: str,
    pattern: str,
    allow_stale: bool,
    driver_decode_max: int,
):
    """Sidecar candidate selection shared by grep_index/grep_lines.
    Returns (content_df, docs_df) where content_df is the content
    table restricted to candidate docs (the full table when the
    pattern yields no usable factors or no sidecar exists), or
    (None, docs_df) when the dictionary PROVES zero matches."""
    p = _tg_paths(index_dir)
    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    have_sidecar = os.path.exists(p["meta"])
    if have_sidecar:
        with open(p["meta"]) as fh:
            tmeta = json.load(fh)
        # staleness = content batches the sidecar has not folded (the
        # sidecar indexes CONTENT, so snapshot-version bumps that add
        # no content — delete/compact commits — do NOT invalidate it;
        # deleted docs are filtered below like any other read path).
        # Old format-1 sidecars lack covered_batches: version compare.
        if "covered_batches" in tmeta:
            stale = sorted(tmeta["covered_batches"]) != sorted(
                _content_batches(index_dir)
            )
        else:
            stale = tmeta.get("index_version") != meta.get("version")
        if stale and not allow_stale:
            raise StaleTrigramIndex(
                f"trigram sidecar covers content batches "
                f"{tmeta.get('covered_batches', '?')}, index has "
                f"{_content_batches(index_dir)} — update_trigram_index "
                f"folds the new batches (or pass allow_stale=True to "
                f"search the stale snapshot)"
            )
    from ..schema import CONTENT_ON_DISK, DOCS_ON_DISK

    content = spark.read.schema(CONTENT_ON_DISK).parquet(
        os.path.join(index_dir, "content")
    )
    docs = spark.read.schema(DOCS_ON_DISK).parquet(
        os.path.join(index_dir, "docs")
    )
    # deleted docs (operators/deletes.py): content/docs are append-only
    # logs that keep tombstoned rows forever — grep must not return
    # them. FULL ledger, anti-join (the sidecar postings may still
    # name the docs; candidates just drop out here).
    from .deletes import read_tombstones

    tomb = read_tombstones(spark, index_dir, meta)
    if tomb is not None:
        tomb_ids = tomb.select("doc_id")
        content = content.join(tomb_ids, "doc_id", "left_anti")
        docs = docs.join(tomb_ids, "doc_id", "left_anti")
    dnf, fold = analyze(pattern)
    if fold and dnf is not None and any(
        not f.isascii() for alt in dnf for f in alt
    ):
        # byte-level case expansion is ASCII-only; non-ASCII caseless
        # folding changes UTF-8 byte widths -> verify scan
        dnf = None

    cand = None
    if dnf is not None and have_sidecar:
        # Every required trigram becomes a GROUP of sidecar keys: a
        # singleton when the pattern is case-sensitive, the <=8 ASCII
        # case variants when it is caseless (analyze() folded the
        # factors; the sidecar stores original case, so a doc matches
        # a caseless factor iff it holds >=1 variant per group).
        alt_groups = [
            [
                _case_variants(t) if fold else (t,)
                for t in sorted({t for fac in alt for t in trigrams_of(fac)})
            ]
            for alt in dnf
        ]
        need = sorted({v for groups in alt_groups for g in groups for v in g})
        tg_sorted, dfs = _load_dictionary(spark, p, tmeta)
        df_of = _df_lookup(tg_sorted, dfs, need)
        gens = tmeta.get("generations", [])

        def _gdf(g):
            # group df = sum over present variants (an upper bound on
            # docs holding the group; exact for singletons). None = no
            # variant occurs in any document.
            present = [v for v in g if v in df_of]
            return sum(df_of[v] for v in present) if present else None

        chosen_per_alt = []  # list of lists of variant tuples
        alt_min_df = []  # each alternative's rarest-group df
        for groups in alt_groups:
            gdfs = [_gdf(g) for g in groups]
            if any(d is None for d in gdfs):
                # a required trigram occurs (in any case) in NO
                # document: this alternative provably matches nothing
                continue
            order = sorted(range(len(groups)), key=lambda i: gdfs[i])
            chosen_per_alt.append(
                [groups[i] for i in order[:R_TRIGRAMS_PER_ALT]]
            )
            alt_min_df.append(gdfs[order[0]])
        if not chosen_per_alt:
            return None, docs
        chosen_groups = sorted(
            {g for groups in chosen_per_alt for g in groups}
        )
        chosen = sorted(
            {v for g in chosen_groups for v in g if v in df_of}
        )
        total_df = sum(df_of[v] for v in chosen)
        # Adaptive route (the Zoekt/codesearch pragmatics): the rarest
        # group's df upper-bounds each alternative's candidate set, and
        # the dictionary hands us those dfs BEFORE any posting read.
        # When the bound says the seek cannot be selective — candidates
        # would be a material fraction of the corpus (proxied by the
        # hottest trigram's df, a tight lower bound on live n_docs) —
        # the decode+intersect+semi-join machinery only ADDS cost over
        # the factor-prefiltered parallel scan, so route to the scan
        # (measured at 240k files: a ~93%-selectivity pattern ran 6x
        # slower through the seek). Small corpora keep the seek (the
        # ISIN_CAND_MAX floor) so the threshold only binds at scale.
        n_docs_bound = int(dfs.max()) if len(dfs) else 0
        est_cands = sum(alt_min_df)
        if est_cands > max(
            ISIN_CAND_MAX, int(GREP_SEEK_MAX_FRACTION * n_docs_bound)
        ):
            if est_cands > (n_docs_bound >> 1):
                # super-hot: most docs hold every required factor, so
                # even the Contains prefilter is a pure extra pass over
                # the corpus — verify on the bare scan (== brute)
                return content, docs
            cand = None  # falls through to the factor-prefiltered scan
        elif total_df <= driver_decode_max:
            # serving shape: the chosen trigrams are by construction the
            # RAREST ones, and the dictionary told us their exact total
            # posting count before touching any fragment — when it's
            # bounded, one pruned collect + local numpy intersect beats
            # a 6-stage distributed plan by ~3x fixed overhead. The
            # candidate list ships back as a broadcast local relation.
            from ..functions import codec

            ck = tmeta.get("commit")
            ids_of = {
                t: _POSTING_CACHE[(p["base"], ck, t)]
                for t in chosen
                if (p["base"], ck, t) in _POSTING_CACHE
            }
            missing = [t for t in chosen if t not in ids_of]
            if missing:
                mb = sorted({_tg_bucket(t) for t in missing})
                by_tg: dict[int, list[np.ndarray]] = {}
                for r in (
                    _read_postings(spark, p["base"], gens)
                    .filter(F.col("bucket").isin(mb))
                    .filter(F.col("tg").isin(missing))
                    .select("tg", "first_doc_id", "n_docs", "doc_deltas")
                    .collect()
                ):
                    by_tg.setdefault(int(r["tg"]), []).append(
                        codec.delta_decode_docids(
                            int(r["first_doc_id"]), bytes(r["doc_deltas"]),
                            int(r["n_docs"]),
                        )
                    )
                for t, frags in by_tg.items():
                    arr = np.sort(np.concatenate(frags))
                    ids_of[t] = arr
                    _posting_cache_put((p["base"], ck, t), arr)
            def _group_ids(g):
                arrs = [ids_of[v] for v in g if v in ids_of]
                if not arrs:
                    return np.empty(0, dtype=np.int64)
                if len(arrs) == 1:
                    return arrs[0]
                return np.unique(np.concatenate(arrs))

            alt_ids = [
                reduce(
                    lambda a, b: np.intersect1d(a, b, assume_unique=True),
                    (_group_ids(g) for g in groups),
                )
                for groups in chosen_per_alt
            ]
            cand_ids = np.unique(np.concatenate(alt_ids))
            if cand_ids.size == 0:
                return None, docs
            if cand_ids.size <= ISIN_CAND_MAX:
                # small candidate set: push the ids into the content
                # scan as an IN filter — ONE stage, no join exchange
                # (a broadcast semi join measured ~1 s of pure
                # machinery at this candidate size). Built as ONE SQL
                # expression, not Column.isin: isin creates a py4j
                # literal per element (~0.6 ms each — 1.3 s of pure
                # driver socket chatter at 2k candidates, linear in
                # the candidate count); the parser ingests the same
                # predicate in one round-trip.
                in_list = ",".join(str(int(i)) for i in cand_ids)
                return content.filter(F.expr(f"doc_id IN ({in_list})")), docs
            cand = F.broadcast(
                spark.createDataFrame(
                    [(int(i),) for i in cand_ids], "doc_id long"
                )
            )  # bounded by driver_decode_max
        else:
            # hot-trigram path: the postings stay distributed —
            # decode in Arrow batches, intersect by per-alternative
            # match count, union the alternatives
            buckets = sorted({_tg_bucket(t) for t in chosen})
            posts = (
                _read_postings(spark, p["base"], gens)
                .filter(F.col("bucket").isin(buckets))
                .filter(F.col("tg").isin(chosen))
            )

            def _decode(pdf_iter):
                from ..functions import codec

                for pdf in pdf_iter:
                    tg_out, id_out = [], []
                    for tg, first, n, buf in zip(
                        pdf["tg"], pdf["first_doc_id"], pdf["n_docs"],
                        pdf["doc_deltas"],
                    ):
                        ids = codec.delta_decode_docids(
                            int(first), bytes(buf), int(n)
                        )
                        tg_out.append(np.repeat(np.int64(tg), int(n)))
                        id_out.append(ids)
                    yield pd.DataFrame({
                        "tg": np.concatenate(tg_out) if tg_out else
                        np.empty(0, dtype=np.int64),
                        "doc_id": np.concatenate(id_out) if id_out else
                        np.empty(0, dtype=np.int64),
                    })

            decoded = posts.mapInPandas(
                _decode, schema="tg long, doc_id long"
            )
            alts_cand = []
            for groups in chosen_per_alt:
                vs = sorted({v for g in groups for v in g if v in df_of})
                if fold:
                    # map each variant to its group and count DISTINCT
                    # groups (a doc may hold two variants of one group)
                    vmap = {
                        v: gi
                        for gi, g in enumerate(groups)
                        for v in g
                        if v in df_of
                    }
                    grp = F.element_at(
                        F.create_map(
                            *[
                                F.lit(x).cast("long")
                                for kv in vmap.items()
                                for x in kv
                            ]
                        ),
                        F.col("tg"),
                    )
                    alts_cand.append(
                        decoded.filter(F.col("tg").isin(vs))
                        .select("doc_id", grp.alias("grp"))
                        .groupBy("doc_id")
                        .agg(F.countDistinct("grp").alias("n_tg"))
                        .filter(F.col("n_tg") == len(groups))
                        .select("doc_id")
                    )
                else:
                    # singleton groups: (tg, doc_id) pairs are distinct
                    # by construction (a doc lands in exactly one salt
                    # fragment per trigram), so plain count(*) equals
                    # countDistinct — cheaper agg
                    alts_cand.append(
                        decoded.filter(F.col("tg").isin(vs))
                        .groupBy("doc_id")
                        .agg(F.count("*").alias("n_tg"))
                        .filter(F.col("n_tg") == len(groups))
                        .select("doc_id")
                    )
            # unhinted: a hot-trigram intersection can still be huge —
            # AQE picks broadcast iff it turns out small
            cand = reduce(
                lambda a, b: a.unionByName(b), alts_cand
            ).distinct()

    verified = content
    if cand is not None:
        verified = content.join(cand, "doc_id", "left_semi")
    elif dnf is not None:
        # no committed sidecar (or non-factorable route): don't degrade
        # silently to a bare full-corpus rlike — push the same JVM
        # Contains factor conjunction regex_search uses into the
        # content scan, so the rlike verify only sees factor-passing
        # rows (ADVICE r06: the fallback previously skipped even this).
        text = F.col("content")
        probe = F.lower(text) if fold else text
        verified = content.filter(
            reduce(
                lambda a, b: a | b,
                (
                    reduce(
                        lambda a, b: a & b,
                        (probe.contains(f) for f in sorted(alt)),
                    )
                    for alt in dnf
                ),
            )
        )
    return verified, docs


def _verify_and_render(
    verified: DataFrame, docs: DataFrame, pattern: str
) -> DataFrame:
    """rlike-verify surviving content rows, count leftmost-non-
    overlapping matches, join doc metadata."""
    text = F.col("content")
    return (
        verified.filter(text.rlike(pattern))
        .select(
            "doc_id",
            F.size(
                F.regexp_extract_all(text, F.lit(pattern), F.lit(0))
            ).alias("n_matches"),
        )
        .join(docs.select("doc_id", "repo", "path"), "doc_id")
        .select("doc_id", "repo", "path", "n_matches")
    )


def grep_bruteforce(spark: SparkSession, index_dir: str, pattern: str) -> DataFrame:
    """The defining full-scan twin of grep_index (tests compare them
    row-for-row): rlike over the whole content table."""
    from ..schema import CONTENT_ON_DISK, DOCS_ON_DISK

    content = spark.read.schema(CONTENT_ON_DISK).parquet(
        os.path.join(index_dir, "content")
    )
    docs = spark.read.schema(DOCS_ON_DISK).parquet(
        os.path.join(index_dir, "docs")
    )
    with open(os.path.join(index_dir, "meta.json")) as fh:
        _meta = json.load(fh)
    from .deletes import read_tombstones

    tomb = read_tombstones(spark, index_dir, _meta)
    if tomb is not None:
        content = content.join(tomb.select("doc_id"), "doc_id", "left_anti")
    text = F.col("content")
    return (
        content.filter(text.rlike(pattern))
        .select(
            "doc_id",
            F.size(
                F.regexp_extract_all(text, F.lit(pattern), F.lit(0))
            ).alias("n_matches"),
        )
        .join(docs.select("doc_id", "repo", "path"), "doc_id")
        .select("doc_id", "repo", "path", "n_matches")
    )

"""Materialized pure-Python oracle side tables for the code-search
driver entries — closing the last two `no_oracle` gaps in the driver's
DuckDB hash gate.

The engine's headline path (full inverted-index build -> block-max WAND
-> structural verify; the reference's whole product, reiz/fetch.py:84-142,
tests/runner.py:204-226) is not expressible as one ANSI-SQL statement
over the raw tables because the tokenizer runs `ast.parse`. But the
TOKENIZER OUTPUT is just a table — so this module materializes, with
pure Python (no Spark), deterministic parquet side tables over the same
seed-fixed corpus the entry queries index:

- code_terms.parquet  (term, doc_id, tf, dl): the per-document term
  bags from functions/tokenizer.tokenize_source, doc ids from the
  bit-parity XXH64 (functions/hashing.doc_id_of).
- code_docs.parquet   (doc_id, repo, path, commit, dl): doc metadata +
  lengths (the BM25 collection stats derive from this).
- code_positions_oracle.parquet: the single-threaded golden answer for
  the structural entry — exhaustive BM25 ranking (oracle.py, the same
  float contract as the engine) + rank-ordered structural verification
  with plans/matcher.match_spans + the reference's link projection.
- code_content.parquet (doc_id, repo, path, content): the raw admitted
  sources (ALL lang==python rows, including parse-failed ones the
  index keeps with parse_ok=False) — ground truth for the trigram-
  sidecar grep entry's RE2 twin.

With these on disk the driver's DuckDB twin can:
- recompute conjunctive BM25 top-k FROM THE TERMS TABLE with its own
  SQL arithmetic (the same formula shape as fulltext.bm25_topk_sql) and
  hash-compare it against the full distributed index+WAND pipeline —
  index build, salted shuffle, delta/varint codec, block-max pruning,
  and metadata join all sit between the shared tokenizer and the
  compared rows;
- hash-compare the distributed candidate->verify->top-k->render
  pipeline against the golden positions table.

Everything is derived from (seed, n_filler) only; generation is
idempotent and atomic (write tmp + os.replace, stamp file last), so
either side of the driver's compare can trigger it safely in any
order. ~180 small files — generation is sub-second.
"""

from __future__ import annotations

import json
import os

from .functions.hashing import doc_id_of
from .functions.links import github_link, username_of
from .functions.tokenizer import tokenize_source
from .sources.corpus import synth_corpus_rows

def _default_base() -> str:
    """Per-user, env-overridable side-table location. A fixed path in
    world-writable /tmp would let another local user pre-create the
    directory with a matching stamp and poisoned parquet (ADVICE r04);
    the uid suffix + 0o700 + ownership check close that."""
    env = os.environ.get("REIZ_IO_SPARK_ORACLE_DIR")
    if env:
        return env
    import tempfile

    uid = os.getuid() if hasattr(os, "getuid") else "na"
    return os.path.join(
        tempfile.gettempdir(), f"reiz_io_spark_oracle_tables_uid{uid}"
    )


ORACLE_TABLES_DIR = _default_base()
ENTRY_N_FILLER = 150
ENTRY_SEED = 42
POSITIONS_QUERY = ("not_constant", "Return(not Constant())")
POSITIONS_K = 10

_STAMP = "params.json"


def _params() -> dict:
    return {
        "n_filler": ENTRY_N_FILLER,
        "seed": ENTRY_SEED,
        "positions_query": list(POSITIONS_QUERY),
        "positions_k": POSITIONS_K,
        "v": 5,  # v5: + code_terms_updated/code_docs_updated (the
        # update-tier twin: victim repo's docs re-tokenized over
        # content + UPDATE_SUFFIX under version-qualified doc_ids)
    }


def terms_path(base: str = ORACLE_TABLES_DIR) -> str:
    return os.path.join(base, "code_terms.parquet")


def docs_path(base: str = ORACLE_TABLES_DIR) -> str:
    return os.path.join(base, "code_docs.parquet")


def positions_path(base: str = ORACLE_TABLES_DIR) -> str:
    return os.path.join(base, "code_positions_oracle.parquet")


def content_path(base: str = ORACLE_TABLES_DIR) -> str:
    return os.path.join(base, "code_content.parquet")


def terms_upd_path(base: str = ORACLE_TABLES_DIR) -> str:
    return os.path.join(base, "code_terms_updated.parquet")


def docs_upd_path(base: str = ORACLE_TABLES_DIR) -> str:
    return os.path.join(base, "code_docs_updated.parquet")


# the update-tier entry's deterministic change set: every doc of this
# repo gets the suffix appended (valid Python adding one more len()
# call site, so the flagship query sees the change). Shared by the
# Spark entry (__spark_entry__._code_search_after_update) and the
# side-table generation below — ONE definition.
UPDATE_VICTIM_REPO = "synth/repo004"
UPDATE_SUFFIX = "\n\ndef updated_probe(seq):\n    return len(seq)\n"


def _updated_doc_id(repo: str, path: str, content: str) -> int:
    """operators/updates.py identity for an updated version:
    xxhash64(repo, path, sha2(content, 256)) — pure-Python bit-parity
    (sha2 emits lowercase hex, hashlib.hexdigest likewise)."""
    import hashlib

    from .functions.hashing import spark_xxhash64

    sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
    return spark_xxhash64(repo, path, sha)


def _indexed_docs() -> list[tuple[int, str, str, str, str, dict]]:
    """[(doc_id, repo, path, commit, content, term_bag)] for every doc
    the index build would admit (lang == python, ast-parseable) — the
    same admission rule as build.prepare_docs + the tokenizer's
    parse_ok flag."""
    out = []
    for repo, path, commit, lang, content in synth_corpus_rows(
        n_filler=ENTRY_N_FILLER, seed=ENTRY_SEED
    ):
        if lang != "python":
            continue
        bag, ok = tokenize_source(content)
        if not ok:
            continue
        out.append((doc_id_of(repo, path), repo, path, commit, content, bag))
    return out


def _positions_rows(docs) -> list[tuple]:
    """The golden answer for the structural entry, computed exactly the
    way structural_topk defines it: exhaustive BM25 ranking of the
    index candidates (oracle.py float contract), then structural
    verification in rank order until POSITIONS_K docs survive; one row
    per (doc, match span) with the reference's link projection."""
    from .oracle import build_oracle_index, oracle_topk
    from .plans.lower import lower_query
    from .plans.matcher import match_spans

    name, source = POSITIONS_QUERY
    q = lower_query(name, source)
    index = build_oracle_index([(d[0], d[4]) for d in docs])
    by_id = {d[0]: d for d in docs}
    ranked = oracle_topk(index, q, k=index.n_docs)

    rows: list[tuple] = []
    n_verified = 0
    for doc_id, score in ranked:
        if n_verified >= POSITIONS_K:
            break
        _, repo, path, commit, content, _bag = by_id[doc_id]
        spans = match_spans(content, source)
        if not spans:
            continue
        n_verified += 1
        for lineno, _col, end_ln, _end_col, _seg in sorted(spans):
            rows.append(
                (
                    doc_id,
                    repo,
                    path,
                    int(lineno),
                    round(float(score), 6),
                    github_link(repo, commit, path, lineno, end_ln),
                    username_of(repo),
                )
            )
    return rows


def ensure_oracle_tables(base: str = ORACLE_TABLES_DIR) -> str:
    """Generate the side tables if absent or stale; returns base dir."""
    # never trust a directory another user owns: the stamp+parquet
    # inside would be attacker-controlled ground truth for the driver's
    # hash gate
    if hasattr(os, "getuid") and os.path.isdir(base):
        if os.stat(base).st_uid != os.getuid():
            raise RuntimeError(
                f"oracle side-table dir {base} is owned by another user; "
                "set REIZ_IO_SPARK_ORACLE_DIR to a directory you own"
            )
    stamp = os.path.join(base, _STAMP)
    want = _params()
    try:
        with open(stamp) as fh:
            if json.load(fh) == want and all(
                os.path.exists(p)
                for p in (
                    terms_path(base), docs_path(base),
                    positions_path(base), content_path(base),
                    terms_upd_path(base), docs_upd_path(base),
                )
            ):
                return base
    except (OSError, json.JSONDecodeError):
        pass

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(base, mode=0o700, exist_ok=True)
    try:
        os.chmod(base, 0o700)  # makedirs mode is umask-subject
    except OSError:
        pass
    docs = _indexed_docs()

    t_term, t_doc, t_tf, t_dl = [], [], [], []
    d_doc, d_repo, d_path, d_commit, d_dl = [], [], [], [], []
    for doc_id, repo, path, commit, _content, bag in docs:
        dl = int(sum(bag.values()))
        d_doc.append(doc_id)
        d_repo.append(repo)
        d_path.append(path)
        d_commit.append(commit)
        d_dl.append(dl)
        for term, tf in bag.items():
            t_term.append(term)
            t_doc.append(doc_id)
            t_tf.append(int(tf))
            t_dl.append(dl)

    def _write(path_: str, table: pa.Table) -> None:
        tmp = path_ + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path_)

    _write(
        terms_path(base),
        pa.table(
            {
                "term": pa.array(t_term, pa.string()),
                "doc_id": pa.array(t_doc, pa.int64()),
                "tf": pa.array(t_tf, pa.int64()),
                "dl": pa.array(t_dl, pa.int64()),
            }
        ),
    )
    _write(
        docs_path(base),
        pa.table(
            {
                "doc_id": pa.array(d_doc, pa.int64()),
                "repo": pa.array(d_repo, pa.string()),
                "path": pa.array(d_path, pa.string()),
                "commit": pa.array(d_commit, pa.string()),
                "dl": pa.array(d_dl, pa.int64()),
            }
        ),
    )
    # updated-corpus variant (the update-tier twin): the victim repo's
    # docs re-tokenized over content + UPDATE_SUFFIX, identity
    # version-qualified exactly as operators/updates.py assigns it
    ut_term, ut_doc, ut_tf, ut_dl = [], [], [], []
    ud_doc, ud_repo, ud_path, ud_commit, ud_dl = [], [], [], [], []
    for doc_id, repo, path, commit, content, bag in docs:
        if repo == UPDATE_VICTIM_REPO:
            content = content + UPDATE_SUFFIX
            bag, ok = tokenize_source(content)
            assert ok, "UPDATE_SUFFIX must keep the victim parseable"
            doc_id = _updated_doc_id(repo, path, content)
        dl = int(sum(bag.values()))
        ud_doc.append(doc_id)
        ud_repo.append(repo)
        ud_path.append(path)
        ud_commit.append(commit)
        ud_dl.append(dl)
        for term, tf in bag.items():
            ut_term.append(term)
            ut_doc.append(doc_id)
            ut_tf.append(int(tf))
            ut_dl.append(dl)
    _write(
        terms_upd_path(base),
        pa.table(
            {
                "term": pa.array(ut_term, pa.string()),
                "doc_id": pa.array(ut_doc, pa.int64()),
                "tf": pa.array(ut_tf, pa.int64()),
                "dl": pa.array(ut_dl, pa.int64()),
            }
        ),
    )
    _write(
        docs_upd_path(base),
        pa.table(
            {
                "doc_id": pa.array(ud_doc, pa.int64()),
                "repo": pa.array(ud_repo, pa.string()),
                "path": pa.array(ud_path, pa.string()),
                "commit": pa.array(ud_commit, pa.string()),
                "dl": pa.array(ud_dl, pa.int64()),
            }
        ),
    )

    # content covers ALL admitted docs (lang == python), NOT just the
    # tokenizer-parseable subset above: the index stores parse-failed
    # sources too (build.prepare_docs keeps them with parse_ok=False,
    # the reference's Insertion.SKIPPED), and grep is a content-level
    # operator that must search them — self-contained columns so the
    # grep oracle never joins the tokenized-docs table
    c_doc, c_repo, c_path, c_content = [], [], [], []
    for repo, path, _commit, lang, content in synth_corpus_rows(
        n_filler=ENTRY_N_FILLER, seed=ENTRY_SEED
    ):
        if lang != "python":
            continue
        c_doc.append(doc_id_of(repo, path))
        c_repo.append(repo)
        c_path.append(path)
        c_content.append(content)
    _write(
        content_path(base),
        pa.table(
            {
                "doc_id": pa.array(c_doc, pa.int64()),
                "repo": pa.array(c_repo, pa.string()),
                "path": pa.array(c_path, pa.string()),
                "content": pa.array(c_content, pa.string()),
            }
        ),
    )
    prow = _positions_rows(docs)
    _write(
        positions_path(base),
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in prow], pa.int64()),
                "repo": pa.array([r[1] for r in prow], pa.string()),
                "path": pa.array([r[2] for r in prow], pa.string()),
                "lineno": pa.array([r[3] for r in prow], pa.int32()),
                "score": pa.array([r[4] for r in prow], pa.float64()),
                "github_link": pa.array([r[5] for r in prow], pa.string()),
                "username": pa.array([r[6] for r in prow], pa.string()),
            }
        ),
    )
    tmp = stamp + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(want, fh)
    os.replace(tmp, stamp)
    return base


def wand_oracle_sql(
    query_name: str, query_source: str, k: int = 10,
    base: str = ORACLE_TABLES_DIR, exclude_repo: str | None = None,
    field_weights: dict[str, float] | None = None,
    terms_file: str | None = None, docs_file: str | None = None,
    offset: int = 0,
) -> str:
    """DuckDB twin of the index+WAND entry: conjunctive BM25 over the
    materialized terms table — DuckDB does the BM25 arithmetic itself
    (same formula shape as fulltext.bm25_topk_sql), so the compare is a
    genuinely independent scoring path. Requires every lowered group to
    be a singleton (true for the fixed entry query).

    ``exclude_repo`` is the delete-tier twin: BM25 recomputed over the
    corpus WITHOUT that repo's docs (df, n_docs, avgdl all shrink) —
    exactly what delete_docs + compact_deletes must produce."""
    from . import BM25_B, BM25_K1
    from .plans.lower import lower_query

    q = lower_query(query_name, query_source)
    terms = []
    for g in q.groups:
        if len(g.terms) != 1:
            raise ValueError("wand_oracle_sql: non-singleton group")
        terms.append(g.terms[0])
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    tf_file = terms_file or terms_path(base)
    df_file = docs_file or docs_path(base)
    live = ""
    if exclude_repo is not None:
        esc = exclude_repo.replace("'", "''")
        live = (
            f" AND doc_id NOT IN (SELECT doc_id FROM "
            f"read_parquet('{df_file}') WHERE repo = '{esc}')"
        )
        live_docs = f" WHERE repo <> '{esc}'"
    else:
        live_docs = ""
    if field_weights:
        cases = " ".join(
            f"WHEN '{ns}' THEN {float(w)!r}"
            for ns, w in sorted(field_weights.items())
        )
        w_expr = f"(CASE split_part(p.term, ':', 1) {cases} ELSE 1.0 END)"
    else:
        w_expr = "1.0"
    return f"""
WITH p AS (
  SELECT term, doc_id, tf, dl
  FROM read_parquet('{tf_file}')
  WHERE term IN ({in_list}){live}
),
s AS (
  SELECT count(*)::DOUBLE AS n_docs,
         sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl
  FROM read_parquet('{df_file}'){live_docs}
),
d AS (SELECT term, count(*) AS df FROM p GROUP BY term),
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + ((SELECT n_docs FROM s) - d.df + 0.5) / (d.df + 0.5))
           * {w_expr}
           * (p.tf * {1.0 + BM25_K1!r})
           / (p.tf + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r}
              * (p.dl / (SELECT avgdl FROM s))))
         ) AS score
  FROM p JOIN d USING (term)
  GROUP BY p.doc_id
  HAVING count(DISTINCT p.term) = {len(terms)}
)
SELECT m.doc_id, m.repo, m.path, round(sc.score, 6) AS score
FROM (SELECT * FROM scored ORDER BY score DESC, doc_id ASC
      LIMIT {k} OFFSET {int(offset)}) sc
JOIN read_parquet('{df_file}') m USING (doc_id)
"""


def explain_oracle_sql(
    query_name: str, query_source: str, base: str = ORACLE_TABLES_DIR
) -> str:
    """DuckDB twin of the score-explain entry: recompute the query's
    BM25 ranking from the side tables, take the top-1 doc, and emit its
    per-term contribution rows — the same (doc_id, term, tf, dl, df,
    idf, weight, contrib) shape score.explain_score returns, so the
    hash compare pins the whole breakdown (tf from the index's runs,
    df/idf from the dictionary, the contribution arithmetic) and not
    just the summed score."""
    from . import BM25_B, BM25_K1
    from .plans.lower import lower_query

    q = lower_query(query_name, query_source)
    terms = []
    for g in q.groups:
        if len(g.terms) != 1:
            raise ValueError("explain_oracle_sql: non-singleton group")
        terms.append(g.terms[0])
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    tf_file = terms_path(base)
    df_file = docs_path(base)
    return f"""
WITH p AS (
  SELECT term, doc_id, tf, dl
  FROM read_parquet('{tf_file}')
  WHERE term IN ({in_list})
),
s AS (
  SELECT count(*)::DOUBLE AS n_docs,
         sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl
  FROM read_parquet('{df_file}')
),
d AS (SELECT term, count(*) AS df FROM p GROUP BY term),
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + ((SELECT n_docs FROM s) - d.df + 0.5) / (d.df + 0.5))
           * (p.tf * {1.0 + BM25_K1!r})
           / (p.tf + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r}
              * (p.dl / (SELECT avgdl FROM s))))
         ) AS score
  FROM p JOIN d USING (term)
  GROUP BY p.doc_id
  HAVING count(DISTINCT p.term) = {len(terms)}
),
top1 AS (SELECT doc_id FROM scored ORDER BY score DESC, doc_id ASC LIMIT 1)
SELECT p.doc_id, p.term, p.tf, p.dl, d.df,
       round(ln(1.0 + ((SELECT n_docs FROM s) - d.df + 0.5)
                / (d.df + 0.5)), 6) AS idf,
       1.0 AS weight,
       round(
         ln(1.0 + ((SELECT n_docs FROM s) - d.df + 0.5) / (d.df + 0.5))
         * (p.tf * {1.0 + BM25_K1!r})
         / (p.tf + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r}
            * (p.dl / (SELECT avgdl FROM s)))), 6) AS contrib
FROM p JOIN d USING (term) JOIN top1 USING (doc_id)
ORDER BY p.term
"""


def facet_oracle_sql(
    query_name: str, query_source: str, facet_col: str = "repo",
    base: str = ORACLE_TABLES_DIR,
) -> str:
    """DuckDB twin of the facet-counts entry: the conjunction's match
    set recomputed from the side tables, grouped by the docs table's
    facet column. Membership (not scoring) is the property under test,
    so the twin needs no BM25 arithmetic at all."""
    from .plans.lower import lower_query

    q = lower_query(query_name, query_source)
    terms = []
    for g in q.groups:
        if len(g.terms) != 1:
            raise ValueError("facet_oracle_sql: non-singleton group")
        terms.append(g.terms[0])
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH m AS (
  SELECT doc_id
  FROM read_parquet('{terms_path(base)}')
  WHERE term IN ({in_list})
  GROUP BY doc_id
  HAVING count(DISTINCT term) = {len(terms)}
)
SELECT d.{facet_col}, count(*) AS n_docs
FROM m JOIN read_parquet('{docs_path(base)}') d USING (doc_id)
GROUP BY d.{facet_col}
ORDER BY n_docs DESC, d.{facet_col} ASC
"""


def positions_oracle_sql(base: str = ORACLE_TABLES_DIR) -> str:
    """DuckDB twin of the structural entry: the pre-materialized golden
    table (single-threaded matcher + oracle BM25), read back verbatim."""
    return f"""
SELECT doc_id, repo, path, lineno, score, github_link, username
FROM read_parquet('{positions_path(base)}')
"""


def grep_oracle_sql(pattern: str, base: str = ORACLE_TABLES_DIR) -> str:
    """DuckDB twin of the trigram-sidecar grep entry: RE2 grep over the
    materialized raw content. The ENTIRE distributed pipeline — index
    build, trigram-sidecar encode (salted fragments, delta+varint),
    bucket-pruned posting seek, per-alternative intersection, rlike
    verify, metadata join — sits between the shared corpus rows and the
    compared output. Portable-syntax patterns only (Java regex on the
    Spark side, RE2 here)."""
    p = pattern.replace("'", "''")
    return (
        f"SELECT doc_id, repo, path, "
        f"len(regexp_extract_all(content, '{p}')) AS n_matches "
        f"FROM read_parquet('{content_path(base)}') "
        f"WHERE regexp_matches(content, '{p}') "
        f"ORDER BY doc_id"
    )


def grep_lines_oracle_sql(pattern: str, base: str = ORACLE_TABLES_DIR) -> str:
    """DuckDB twin of the line-grained grep entry (``grep -n``): split
    the raw content into lines (unnest zipped with generate_subscripts
    for the 1-based line number) and RE2-match each line — same
    line-at-a-time contract as the Spark posexplode+rlike side."""
    p = pattern.replace("'", "''")
    return (
        f"SELECT doc_id, repo, path, CAST(lineno AS INTEGER) AS lineno, "
        f"line FROM ("
        f"  SELECT doc_id, repo, path, "
        f"    generate_subscripts(string_split(content, chr(10)), 1)"
        f"      AS lineno, "
        f"    unnest(string_split(content, chr(10))) AS line "
        f"  FROM read_parquet('{content_path(base)}')"
        f") WHERE regexp_matches(line, '{p}') "
        f"ORDER BY doc_id, lineno"
    )

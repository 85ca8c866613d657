"""Result-projection link inference — the first thing a reiz.io user
sees in every rendered result row.

The reference infers a GitHub URL per result from the project's git
source + revision + filename and anchors it to the matched line span,
and extracts the repo owner as `username`
(/root/reference/reiz/fetch.py:44-57 get_username/infer_github_url,
fetch.py:84-107 process_queryset builds `#L<lineno>-L<end_lineno>`).
Our corpus schema carries `repo` as "owner/name" and `commit` as the
pinned revision, so the inference is:

    https://github.com/<repo>/tree/<commit>/<path>#L<start>-L<end>
    username = repo.split("/")[0]

(The reference strips the first filename component because its dataset
paths are prefixed with a checkout dir, fetch.py:59; our `path` is
already repo-relative.) Both a driver-side and a Column flavor exist so
the serving tier and the distributed projection emit identical strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def github_link(
    repo: str,
    commit: str | None,
    path: str,
    lineno: int | None = None,
    end_lineno: int | None = None,
) -> str:
    base = f"https://github.com/{repo}/tree/{commit or 'HEAD'}/{path}"
    if lineno is None:
        return base
    return f"{base}#L{lineno}-L{end_lineno if end_lineno is not None else lineno}"


def username_of(repo: str) -> str:
    return repo.split("/")[0]


def github_link_col(
    repo: str | Column = "repo",
    commit: str | Column = "commit",
    path: str | Column = "path",
    lineno: str | Column | None = None,
    end_lineno: str | Column | None = None,
) -> Column:
    """Column twin of github_link (same string, JVM-side)."""
    base = F.concat(
        F.lit("https://github.com/"),
        F.col(repo) if isinstance(repo, str) else repo,
        F.lit("/tree/"),
        F.coalesce(F.col(commit) if isinstance(commit, str) else commit,
                   F.lit("HEAD")),
        F.lit("/"),
        F.col(path) if isinstance(path, str) else path,
    )
    if lineno is None:
        return base
    ln = F.col(lineno) if isinstance(lineno, str) else lineno
    end = F.col(end_lineno) if isinstance(end_lineno, str) else end_lineno
    return F.concat(base, F.lit("#L"), ln.cast("string"),
                    F.lit("-L"), F.coalesce(end, ln).cast("string"))


def username_col(repo: str | Column = "repo") -> Column:
    return F.split(F.col(repo) if isinstance(repo, str) else repo, "/").getItem(0)

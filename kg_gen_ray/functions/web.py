"""URL / host-level operators for web-crawl corpora.

A Common-Crawl-style pages table carries structure in the ``url`` column
that every serious training-data pipeline exploits: URL-normalized exact
dedup (the cheapest dedup pass — it removes re-crawls of the same page
before any content hashing), per-host document budgets (C4/RefinedWeb-style
source balancing, so one mega-site cannot dominate the corpus), and
host-level corpus statistics for curation review.

Everything parses with Arrow RE2 kernels (``pyarrow.compute.extract_regex``
/ ``replace_substring_regex``) — no Python touches a row, the stage streams
like any other ``map_batches``, and DuckDB (also RE2) replays the exact
pattern strings, so the tests pin every derived column against a SQL
oracle (same contract as :mod:`kg_gen_ray.functions.scrub`).

Scale notes: ``url_parts`` / ``with_norm_url`` are pure per-batch maps;
``url_dedup`` is the standard combiner + hash-groupby (shuffle rows = one
per distinct URL per batch, not per input row); ``host_stats`` pre-
aggregates per batch before its groupby; ``per_host_cap`` reuses the
combiner-pruned grouped-head exchange of
:func:`kg_gen_ray.functions.sessions.stratified_sample` — a hot host is
cut to ``cap`` rows inside every batch before the shuffle, so skew cannot
melt a reducer.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# One RE2 pass splits scheme://hostport/path; query/fragment are excluded
# by the [^?#] classes. Rows that are not absolute URLs surface as "".
URL_PATTERN = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
               r"(?P<hostport>[^/?#]+)(?P<path>[^?#]*)")


def _fill(col) -> pa.Array:
    return pc.fill_null(col, "")


def url_parts(ds: "ray.data.Dataset", url_col: str = "url"
              ) -> "ray.data.Dataset":
    """Append ``scheme``, ``host`` (lowercased, port stripped), ``path``
    and ``tld`` (last host label) to every row. Non-URL rows get ""."""

    def fn(t: pa.Table) -> pa.Table:
        st = pc.extract_regex(pc.cast(t[url_col], pa.string()),
                              pattern=URL_PATTERN)
        host = _fill(pc.replace_substring_regex(
            pc.utf8_lower(pc.struct_field(st, "hostport")),
            pattern=r":\d+$", replacement=""))
        tld = _fill(pc.struct_field(
            pc.extract_regex(host, pattern=r"\.(?P<tld>[^.]+)$"), "tld"))
        return (t.append_column("scheme",
                                _fill(pc.struct_field(st, "scheme")))
                 .append_column("host", host)
                 .append_column("path", _fill(pc.struct_field(st, "path")))
                 .append_column("tld", tld))

    return ds.map_batches(fn, batch_format="pyarrow")


def _norm_url_kernel(urls) -> pa.Array:
    """Lower-cased scheme+host, ``www.`` and default-port stripped,
    query/fragment dropped, trailing slash trimmed — the C4-style
    canonical form under which re-crawls of one page collide."""
    st = pc.extract_regex(pc.cast(urls, pa.string()), pattern=URL_PATTERN)
    scheme = pc.utf8_lower(pc.struct_field(st, "scheme"))
    host = pc.utf8_lower(pc.struct_field(st, "hostport"))
    # strip only the scheme's OWN default port: http://host:443/x is a
    # different resource than http://host/x and must not collide
    host = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(host, pattern=r":80$", replacement=""),
        host)
    host = pc.if_else(
        pc.equal(scheme, "https"),
        pc.replace_substring_regex(host, pattern=r":443$", replacement=""),
        host)
    host = pc.replace_substring_regex(host, pattern=r"^www\.",
                                      replacement="")
    path = pc.replace_substring_regex(pc.struct_field(st, "path"),
                                      pattern=r"/+$", replacement="")
    # last argument is the join separator; "://" rides as a scalar element
    return _fill(pc.binary_join_element_wise(scheme, "://", host, path, ""))


def with_norm_url(ds: "ray.data.Dataset", url_col: str = "url",
                  out_col: str = "norm_url") -> "ray.data.Dataset":
    """Append the normalized-URL column."""

    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, _norm_url_kernel(t[url_col]))

    return ds.map_batches(fn, batch_format="pyarrow")


def url_dedup(ds: "ray.data.Dataset", url_col: str = "url",
              id_col: str = "doc_id",
              shuffle_partitions=None) -> "ray.data.Dataset":
    """Keep the min-id row per normalized URL -> (id, norm_url).

    The re-crawl filter: same combiner + hash-groupby shape as
    :func:`kg_gen_ray.functions.dedup.exact_dedup` (partial min per batch,
    so the exchange carries one row per distinct URL per batch).

    Rows whose URL does not parse (``norm_url`` "") are NOT re-crawls of
    one another — each survives on its own (internally keyed by a
    per-row sentinel so the groupby cannot collapse a whole shard of
    relative/malformed URLs into one survivor)."""
    from ray.data.aggregate import Min

    from kg_gen_ray.stages.common import coalesce

    def local_min(t: pa.Table) -> pa.Table:
        norm = _norm_url_kernel(t[url_col])
        ids = pc.cast(t[id_col], pa.int64())
        # unparseable -> unique sentinel key "\x00<id>" (never collides
        # with a real normalized url, which starts with a scheme letter)
        sentinel = pc.binary_join_element_wise(
            "\x00", pc.cast(ids, pa.string()), "")
        keyed = pc.if_else(pc.equal(norm, ""), sentinel, norm)
        part = pa.table({"norm_url": keyed, id_col: ids})
        return part.group_by(["norm_url"]).aggregate([(id_col, "min")]) \
                   .rename_columns(["norm_url", id_col])

    partial = coalesce(ds.map_batches(local_min, batch_format="pyarrow"),
                       shuffle_partitions)
    out = partial.groupby("norm_url").aggregate(
        Min(id_col, alias_name=id_col))

    def unsentinel(t: pa.Table) -> pa.Table:
        norm = pc.if_else(
            pc.starts_with(pc.cast(t["norm_url"], pa.string()), "\x00"),
            "", pc.cast(t["norm_url"], pa.string()))
        return pa.table({id_col: t[id_col], "norm_url": norm})

    return out.select_columns([id_col, "norm_url"]) \
              .map_batches(unsentinel, batch_format="pyarrow")


def url_dedup_losers(ds: "ray.data.Dataset", url_col: str = "url",
                     id_col: str = "doc_id",
                     shuffle_partitions=None) -> "ray.data.Dataset":
    """Ids of rows that LOSE URL dedup (every row per normalized URL
    except the min id) -> ``(doc_id,)`` — named ``doc_id`` regardless of
    ``id_col``, the :func:`kg_gen_ray.functions.dedup.drop_ids` loser-side
    contract.

    The loser orientation is what a filtering pipeline wants: on a
    healthy corpus losers are the small side, so the downstream
    ``drop_ids`` anti-join broadcasts instead of shuffling O(corpus)
    survivor ids (the same argument as
    :func:`kg_gen_ray.functions.dedup.near_dup_losers`). Two-level min:
    in-batch losers are emitted directly and only per-batch minima enter
    the exchange — one row per (batch, URL). Rows whose URL does not
    parse are never losers (a shard of relative/malformed URLs is not a
    set of re-crawls of one page)."""
    import numpy as np

    from kg_gen_ray.stages.common import coalesce

    def local(t: pa.Table) -> pa.Table:
        norm = _norm_url_kernel(t[url_col])
        parseable = pc.not_equal(norm, "")
        urls = norm.filter(parseable).to_numpy(zero_copy_only=False)
        ids = pc.cast(t[id_col], pa.int64()).filter(parseable) \
                .to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, urls))
        first = np.ones(len(order), dtype=bool)
        su = urls[order]
        first[1:] = su[1:] != su[:-1]
        keep_idx = order[first]          # per-batch min id per url
        lose_idx = order[~first]
        return pa.table({
            "norm_url": pa.array(np.concatenate([su[first], su[~first]]),
                                 pa.string()),
            "doc_id": pa.array(np.concatenate([ids[keep_idx],
                                               ids[lose_idx]])
                               .astype(np.int64)),
            "is_min": pa.array(np.concatenate(
                [np.ones(first.sum(), dtype=bool),
                 np.zeros((~first).sum(), dtype=bool)])),
        })

    # checkpoint before branching (the paragraphs/spans convention): the
    # two filters below are separate lineage consumers, and without the
    # materialize each would re-scan the input and re-run the normalize
    marked = ds.map_batches(local, batch_format="pyarrow").materialize()
    local_losers = marked.filter(expr="is_min == False") \
                         .select_columns(["doc_id"])
    # slim the exchange: is_min is constant-true after the filter
    minima = coalesce(marked.filter(expr="is_min == True")
                      .select_columns(["norm_url", "doc_id"]),
                      shuffle_partitions)

    # bucket-hashed global min (the paragraphs._mark_occurrences shape):
    # a per-distinct-URL map_groups would pay ms-scale Python overhead
    # per URL — O(corpus distinct URLs) groups; one bucket holds many
    # URL-groups and the all-but-min mask is a vectorized lexsort.
    # marked's materialized size lets the count grow with volume
    from kg_gen_ray.stages.common import default_buckets, hash_bucket_array
    n_buckets = default_buckets(marked.size_bytes())

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", hash_bucket_array(t["norm_url"], n_buckets))

    def all_but_min(t: pa.Table) -> pa.Table:
        # Arrow C++ end to end (norm_url is a string — numpy/pandas would
        # sort Python objects): after a (url, id) sort, losers are every
        # row whose url equals its predecessor's
        if t.num_rows <= 1:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        s = t.sort_by([("norm_url", "ascending"), ("doc_id", "ascending")])
        u = s["norm_url"].combine_chunks()
        d = s["doc_id"].combine_chunks()
        same = pc.equal(u.slice(1), u.slice(0, len(u) - 1))
        return pa.table({
            "doc_id": pc.cast(d.slice(1).filter(same), pa.int64())})

    global_losers = minima.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(all_but_min,
                                        batch_format="pyarrow") \
        .select_columns(["doc_id"])
    return local_losers.union(global_losers)


def host_stats(ds: "ray.data.Dataset", url_col: str = "url",
               text_col: str = "text",
               shuffle_partitions=None) -> "ray.data.Dataset":
    """Per-host (host, n_pages, n_chars) — the curation-review table.
    Pre-aggregated inside each batch, so the groupby input is one row per
    (batch, host)."""
    from ray.data.aggregate import Sum

    from kg_gen_ray.stages.common import coalesce

    def local(t: pa.Table) -> pa.Table:
        st = pc.extract_regex(pc.cast(t[url_col], pa.string()),
                              pattern=URL_PATTERN)
        host = _fill(pc.replace_substring_regex(
            pc.utf8_lower(pc.struct_field(st, "hostport")),
            pattern=r":\d+$", replacement=""))
        part = pa.table({
            "host": host,
            "n_pages": pa.array([1] * t.num_rows, pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(
                pc.cast(t[text_col], pa.string())), pa.int64()),
        })
        return part.group_by(["host"]).aggregate(
            [("n_pages", "sum"), ("n_chars", "sum")]) \
            .rename_columns(["host", "n_pages", "n_chars"])

    partial = coalesce(ds.map_batches(local, batch_format="pyarrow"),
                       shuffle_partitions)
    return partial.groupby("host").aggregate(
        Sum("n_pages", alias_name="n_pages"),
        Sum("n_chars", alias_name="n_chars"))


# Filename sanitizer (SURVEY.md §2.2 M5 — reference
# ``experiments/wikiqa/_1_download_articles.py:59-63``): strip non-word
# chars, trim, collapse hyphen/whitespace runs to "_", collapse "_" runs.
# ASCII scope pin: the reference runs CPython ``re`` (unicode ``\w``/
# ``\s``); these kernels run Arrow RE2 (ASCII classes), which is also what
# DuckDB ``regexp_replace`` runs — so engine == oracle bit-for-bit on any
# host, and == reference on ASCII titles (the corpus; non-ASCII word chars
# and \v are the documented divergence family, same contract as
# :mod:`kg_gen_ray.stages.chunker`'s punkt pin).
_FNAME_TRIM = " \t\n\r\x0b\x0c"


def sanitize_filenames(col) -> pa.Array:
    """Vectorized article-title -> safe-filename kernel (Arrow RE2)."""
    s = pc.cast(col, pa.string())
    s = pc.replace_substring_regex(s, pattern=r"[^\w\s-]", replacement="")
    s = pc.utf8_trim(s, characters=_FNAME_TRIM)
    s = pc.replace_substring_regex(s, pattern=r"[-\s]+", replacement="_")
    return pc.replace_substring_regex(s, pattern=r"_+", replacement="_")


def sanitize_filename(title: str) -> str:
    """Scalar convenience wrapper — same kernel, one-element array, so the
    scalar and vectorized paths can never diverge."""
    return sanitize_filenames(pa.array([title]))[0].as_py()


def per_host_cap(ds: "ray.data.Dataset", cap: int, url_col: str = "url",
                 id_col: str = "doc_id", text_col: str = "text"
                 ) -> "ray.data.Dataset":
    """At most ``cap`` documents per host, chosen deterministically
    (smallest md5(text), ties by id) — C4/RefinedWeb-style source
    balancing via the combiner-pruned stratified exchange."""
    from kg_gen_ray.functions.sessions import stratified_sample

    hosted = url_parts(ds, url_col)
    out = stratified_sample(hosted, "host", cap, id_col, text_col)
    return out.map_batches(
        lambda t: t.drop_columns(["scheme", "host", "path", "tld"]),
        batch_format="pyarrow")


def crawl_delta(old: "ray.data.Dataset", new: "ray.data.Dataset",
                url_col: str = "url", text_col: str = "text",
                n_buckets: int | None = None) -> "ray.data.Dataset":
    """Snapshot-to-snapshot crawl diff — the incremental-ingest planner of
    a recurring-crawl pipeline: compare two crawl snapshots by per-url
    content fingerprint and emit ``(url, status, old_fp, new_fp)`` with
    ``status`` in {'added', 'removed', 'changed'}. Unchanged urls are NOT
    emitted, so the output is O(delta) — on a 100 TB recrawl where most
    pages are stable, downstream stages (re-extract, re-embed, re-dedup)
    run over the delta only.

    Per side, a url's fingerprint is ``min(md5(text))`` over its rows
    (re-crawl duplicates collapse deterministically; DuckDB mirrors with
    ``min(md5(text))``). Null-text rows and null urls are dropped
    (md5(NULL) is NULL — no replayable identity), matching the SQL
    mirror's WHERE clauses.

    Scale shape: each side maps to a slim (url, fp) projection with an
    in-batch Arrow ``group_by().aggregate(min)`` combiner — re-crawls of
    one url inside a batch never reach the exchange — then ONE
    bucket-hashed groupby classifies per bucket with vectorized pandas.
    The exchange carries one ~50-byte row per distinct (url, batch), never
    page text. md5 is the oracle family, memoized per distinct text
    (:func:`kg_gen_ray.stages.common.md5_hex_memo` — re-crawl duplicates
    inside a batch hash once)."""
    import numpy as np
    import pandas as pd

    from kg_gen_ray.stages.common import (default_buckets,
                                          hash_bucket_array, md5_hex_memo)
    nb = n_buckets or default_buckets()

    def slim(side: int):
        def fn(t: pa.Table) -> pa.Table:
            urls = pc.cast(t[url_col], pa.string())
            texts = pc.cast(t[text_col], pa.string())
            keep = pc.and_(pc.is_valid(urls), pc.is_valid(texts))
            t2 = pa.table({"url": urls, "text": texts}).filter(keep)
            proj = pa.table({
                "url": t2["url"],
                "fp": md5_hex_memo(t2["text"]),
                "side": pa.array([side] * t2.num_rows, pa.int8()),
            })
            # in-batch combiner: one (url, side, min fp) row per distinct
            # url — Arrow C++ group_by, no pandas round-trip
            agg = pa.TableGroupBy(proj, ["url", "side"]).aggregate(
                [("fp", "min")]).rename_columns(["url", "side", "fp"])
            return agg.append_column(
                "__b", hash_bucket_array(agg["url"], nb))
        return fn

    keyed = old.map_batches(slim(0), batch_format="pyarrow").union(
        new.map_batches(slim(1), batch_format="pyarrow"))

    def classify(df: pd.DataFrame) -> pa.Table:
        fp = df.groupby(["url", "side"], sort=True)["fp"].min() \
               .unstack("side")
        old_fp = fp[0] if 0 in fp.columns else pd.Series(
            np.nan, index=fp.index, dtype=object)
        new_fp = fp[1] if 1 in fp.columns else pd.Series(
            np.nan, index=fp.index, dtype=object)
        status = np.where(
            old_fp.isna(), "added",
            np.where(new_fp.isna(), "removed",
                     np.where(old_fp != new_fp, "changed", "unchanged")))
        keep = status != "unchanged"
        # emit Arrow with a pinned schema: an all-unchanged bucket yields
        # an EMPTY block, and empty object-dtype pandas columns make
        # Ray's block sizing (and downstream schema resolution) guess
        return pa.table({
            "url": pa.array(fp.index.to_numpy(dtype=object)[keep],
                            pa.string()),
            "status": pa.array(status[keep], pa.string()),
            "old_fp": pa.array(
                [None if pd.isna(v) else v
                 for v in old_fp.to_numpy(dtype=object)[keep]], pa.string()),
            "new_fp": pa.array(
                [None if pd.isna(v) else v
                 for v in new_fp.to_numpy(dtype=object)[keep]], pa.string()),
        })

    return keyed.groupby("__b").map_groups(classify, batch_format="pandas")

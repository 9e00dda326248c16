"""Randomized-corpus differential harness: run driver queries() against
their oracle_sql() on a FUZZED documents table — nulls, unicode, empty
strings, heavy duplication, CJK, emoji — not just the fixed sf fixtures.
The oracles define the semantics; if engine and DuckDB agree on a corpus
the fixtures never exercised, the agreement is about the operators, not
the data. Doc-only queries only (the fuzz dir carries documents.parquet);
the time/vector families have their own randomized serial replays."""

import hashlib
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

FUZZ_QUERIES = [
    "dedup_exact", "hash_sample", "mix_sample", "seeded_shuffle",
    "crawl_delta", "paragraph_dedup", "dedup_simhash", "text_tokens",
    "approx_distinct_by_lang", "grouped_topk", "minhash_signatures",
    "dedup_spans", "token_quantiles",
]

_TEMPLATES = [
    "the cat sat on the mat. the dog ate the bone. fin",
    "der hund und die katze. das ist ein test. ende",
    "café naïve — déjà vu. le chat est dans la maison. voilà",
    "北京 is a city. 東京 is another. the end",
    "boilerplate footer text appears on every page. contact us today",
    "emoji soup 🦊🦊 and more 🎉. short",
    "   ",
    "",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "repeat repeat repeat repeat repeat repeat repeat repeat repeat",
]


def _fuzz_corpus(tmpdir: str, seed: int = 4117, n: int = 300) -> str:
    rng = np.random.default_rng(seed)
    ids = rng.permutation(np.arange(1, n + 1))
    langs = np.array(["en", "de", "fr", "es", "zh", None], dtype=object)
    texts, lang_col = [], []
    for i in range(n):
        r = rng.random()
        if r < 0.05:
            texts.append(None)
        elif r < 0.45:                       # heavy duplication
            texts.append(_TEMPLATES[int(rng.integers(len(_TEMPLATES)))])
        else:                                # unique-ish compositions
            k = int(rng.integers(1, 4))
            parts = [_TEMPLATES[int(rng.integers(len(_TEMPLATES)))]
                     for _ in range(k)]
            texts.append(f"u{i} " + ". ".join(parts))
        lang_col.append(langs[int(rng.integers(len(langs)))])
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang_col, pa.string()),
        "source": pa.array(
            [f"s{int(rng.integers(3))}" for _ in range(n)], pa.string()),
        "n_chars": pa.array(
            [len(t) if t is not None else None for t in texts], pa.int64()),
    })
    path = os.path.join(tmpdir, "fuzz_sf")
    os.makedirs(path, exist_ok=True)
    pq.write_table(tbl, os.path.join(path, "documents.parquet"))
    return path


def _value_hash(df) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    rows = sorted(df.astype(str).values.tolist())
    return hashlib.md5(
        "\n".join(",".join(r) for r in rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    return _fuzz_corpus(str(tmp_path_factory.mktemp("fuzz")))


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_query_matches_oracle_on_fuzzed_corpus(ray_session, fuzz_dir, name):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as mod

    res = mod.queries()[name](fuzz_dir)
    rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{fuzz_dir}/documents.parquet')")
    odf = con.execute(mod.oracle_sql()[name]).df()
    assert sorted(map(str, rdf.columns)) == sorted(map(str, odf.columns))
    assert len(rdf) == len(odf), (len(rdf), len(odf))
    assert _value_hash(rdf) == _value_hash(odf)

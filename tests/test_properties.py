"""Property-based invariants (hypothesis) for the pure-Python kernels
the engine's correctness leans on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ontario_spark.catalog.model import Template
from ontario_spark.sources.pushdown import sparql_value_term, values_block
from ontario_spark.sources.translate import _regex_to_like, tpl_shape

key_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="{}/"),
    min_size=1,
    max_size=30,
)


@settings(max_examples=200)
@given(key_text)
def test_template_format_extract_roundtrip(key):
    t = Template("http://ex.org/thing/{k}")
    uri = "http://ex.org/thing/" + key
    assert t.extract(uri) == (key,)


@settings(max_examples=200)
@given(st.one_of(st.text(max_size=40), st.integers(), st.booleans(),
                 st.floats(allow_nan=False, allow_infinity=False)))
def test_sparql_value_term_is_well_formed(v):
    term = sparql_value_term(v)
    if term.startswith("<"):
        assert term.endswith(">")
        inner = term[1:-1]
        assert not (set(inner) & set(' <>"{}|\\^`\n\r\t'))
    elif term.startswith('"'):
        assert term.endswith('"')
        # the body never contains an unescaped quote or backslash
        body = term[1:-1]
        i = 0
        while i < len(body):
            if body[i] == "\\":
                assert i + 1 < len(body) and body[i + 1] in '\\"nr'
                i += 2
            else:
                assert body[i] != '"'
                i += 1
    # numeric/boolean terms round-trip textually
    else:
        assert term in ("true", "false") or term == repr(v)


@settings(max_examples=100)
@given(st.lists(st.one_of(st.text(max_size=10), st.integers()), max_size=8))
def test_values_block_shape(keys):
    block = values_block("v", keys)
    assert block.startswith("VALUES ?v { ") and block.endswith("}")


@settings(max_examples=200)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=20))
def test_regex_to_like_only_converts_simple_patterns(rx):
    out = _regex_to_like(rx)
    if out is not None:
        # converted patterns contain no regex metacharacters
        body = out.strip("%")
        assert not (set(body) & set("\\^$.|?*+()[]{}"))


def test_tpl_shape_ignores_column_names():
    assert tpl_shape("http://e/{a}/{b}") == tpl_shape("http://e/{x}/{y}")
    assert tpl_shape("http://e/{a}") != tpl_shape("http://f/{a}")


@settings(max_examples=300)
@given(st.text(max_size=40))
def test_dialect_lit_is_well_formed(s):
    """Mirror of test_sparql_value_term_is_well_formed for SQL string
    literals (round-3 advice): under MySQL's default mode backslash is
    an escape char, so a data-derived value ending in '\\' must not be
    able to escape the closing quote."""
    from ontario_spark.sources.translate import ANSI, DRILL, MYSQL

    for d in (MYSQL, ANSI, DRILL):
        lit = d.lit(s)
        assert lit[0] == "'" and lit[-1] == "'"
        body = lit[1:-1]
        i = 0
        while i < len(body):
            if body[i] == "'":
                # only as a doubled quote
                assert i + 1 < len(body) and body[i + 1] == "'"
                i += 2
            elif body[i] == "\\" and d.backslash_escapes:
                assert i + 1 < len(body) and body[i + 1] == "\\"
                i += 2
            else:
                i += 1


# --- round-6 operator invariants (Spark-backed, small example budgets)

token = st.text(alphabet="abcdefgh", min_size=1, max_size=3)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(token, min_size=0, max_size=150),
    st.integers(min_value=2, max_value=20),
    st.integers(min_value=0, max_value=10),
)
def test_chunk_documents_reconstructs_exactly(spark, toks, chunk, overlap):
    """Concatenating every chunk's first `step` tokens plus the last
    chunk whole reproduces the document token-for-token — full
    coverage, no gaps, deterministic overlap."""
    from ontario_spark.operators.textops import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    step = chunk - overlap
    text = " ".join(toks)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, "doc_id", "text", chunk, overlap).collect(),
        key=lambda r: r["chunk_id"],
    )
    expect = toks if toks else [""]  # split("") → [""] (documented)
    got: list[str] = []
    for r in rows[:-1]:
        got.extend(r["chunk_text"].split(" ")[:step])
    got.extend(rows[-1]["chunk_text"].split(" "))
    assert got == expect
    # every chunk except possibly the last is exactly `chunk` long
    # whenever the document is long enough to fill it
    for r in rows[:-1]:
        assert r["n_chunk_tokens"] == chunk


# pattern-side cells: strings or unbound. VALUES cells additionally
# draw ints and bools (typed literals → a long/boolean VALUES column),
# exercising the ANSI-safe lexical comparison and the dtype-mismatch
# merge fallback (round-8 second review: an all-string generator
# missed exactly that surface). "1"/"true" strings overlap the int/
# bool lexical forms on purpose.
_sv = st.one_of(st.none(), st.sampled_from(["x", "1", "true", "2.5"]))
_vv = st.one_of(
    st.none(),
    st.sampled_from(["x", "1", "true"]),
    st.integers(min_value=0, max_value=2),
    st.booleans(),
    st.sampled_from([2.5]),  # mixes with ints → heterogeneous lexical
)


def _lex(x):
    """SPARQL lexical form of a VALUES literal (Spark CAST AS STRING
    agrees for string/long/boolean)."""
    if x is None:
        return None
    if isinstance(x, bool):
        return "true" if x else "false"
    return str(x)


@settings(max_examples=10, deadline=None)
@given(
    # solution multiset over vars (a, b): None = unbound
    st.lists(st.tuples(_sv, _sv), min_size=0, max_size=6),
    # VALUES rows over vars (a, c): None = UNDEF
    st.lists(st.tuples(_vv, _vv), min_size=0, max_size=4),
)
def test_join_values_matches_spec_join(spark, sf_small, sols, vrows):
    """_join_values == the §10.2 Join of the solution multiset with
    the VALUES multiset, computed by a direct Python model over
    LEXICAL forms: compatible iff every var bound in BOTH agrees
    lexically; merge takes the union of bindings. Covers UNDEF
    wildcards, pattern-side unbound merges, shared+fresh variables,
    mixed dtypes, the empty data block, and multiset counts."""
    from collections import Counter

    from ontario_spark.catalog.tpch_rdf import tpch_catalog
    from ontario_spark.compiler.frame import LEXICAL, BFrame, TermMeta
    from ontario_spark.compiler.query import SparqlEngine
    from ontario_spark.sparql.ast import Term, ValuesBlock

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    bf = BFrame(
        spark.createDataFrame(sols, "a string, b string")
        if sols
        else spark.createDataFrame([], "a string, b string"),
        {"a": TermMeta(LEXICAL), "b": TermMeta(LEXICAL)},
        # frames with unbound cells must carry flags (the engine
        # invariant _join_values trusts: non-flagged = never NULL)
        frozenset(
            v
            for i, v in enumerate(("a", "b"))
            if any(row[i] is None for row in sols)
        ),
    )
    vb = ValuesBlock(
        variables=["a", "c"],
        rows=[
            tuple(
                None if x is None else Term("literal", _lex(x), py=x)
                for x in row
            )
            for row in vrows
        ],
    )
    got = Counter(
        (_lex(r["a"]), r["b"], _lex(r["c"]))
        for r in eng._join_values(bf, vb).df.collect()
    )
    expect: Counter = Counter()
    for sa, sb in sols:
        for va, vc in vrows:
            la = _lex(va)
            if sa is not None and la is not None and sa != la:
                continue  # bound-bound lexical disagreement
            expect[(sa if sa is not None else la, sb, _lex(vc))] += 1
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(token, min_size=3, max_size=25), min_size=2, max_size=5
    )
)
def test_containment_bounds_jaccard(spark, docs):
    """For every reported pair: jaccard ≤ containment ≤ 1, and the two
    joins agree on the candidate pair set at threshold 0."""
    from ontario_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", n=2, threshold=0.0
        ).collect()
    }
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in dedup.ngram_containment_pairs(
            df, "doc_id", "text", n=2, threshold=0.0
        ).collect()
    }
    assert set(jac) == set(cont)
    for pair, c in cont.items():
        assert jac[pair] - 1e-12 <= c <= 1.0 + 1e-12


# --- parser robustness fuzz -------------------------------------------


_SPARQL_FRAGMENTS = st.sampled_from([
    "SELECT", "WHERE", "FILTER", "OPTIONAL", "UNION", "MINUS", "BIND",
    "VALUES", "EXISTS", "NOT", "GRAPH", "SERVICE", "GROUP BY", "ORDER BY",
    "LIMIT", "OFFSET", "DISTINCT", "AS", "a", "{", "}", "(", ")", ".", ";",
    ",", "||", "&&", "!", "=", "<", ">", "+", "*", "/", "?x", "?y", "$z",
    "ex:p", "<http://e/x>", "'lit'", '"lit"', "42", "-3.5", "1e3",
    "'''long'''", "@en", "^^xsd:int", "UNDEF", "_:b0", "#c\n", "PREFIX",
 # review fix: reach the typed-literal coercion and \U escape paths
 # the original pool structurally could not
 '"abc"^^<http://www.w3.org/2001/XMLSchema#integer>',
 '"\\UFFFFFFFF"', '"\\u0041"',
])


@settings(max_examples=300, deadline=None)
@given(st.lists(_SPARQL_FRAGMENTS, min_size=1, max_size=25))
def test_parser_fuzz_fails_closed(frags):
    """Arbitrary token soup must either parse to a Query or raise the
    parser's OWN error type — never an IndexError/KeyError/
    AttributeError escape or a hang (the HTTP server surfaces parser
    errors to clients verbatim, so fail-closed matters)."""
    from ontario_spark.sparql.ast import Query
    from ontario_spark.sparql.parser import SparqlSyntaxError, parse

    text = " ".join(frags)
    try:
        q = parse(text)
    except SparqlSyntaxError:
        return
    assert isinstance(q, Query)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_parser_fuzz_raw_text_fails_closed(text):
    """Raw unicode noise (not even token-shaped) also fails closed."""
    from ontario_spark.sparql.ast import Query
    from ontario_spark.sparql.parser import SparqlSyntaxError, parse

    try:
        q = parse(text)
    except SparqlSyntaxError:
        return
    assert isinstance(q, Query)


# --- round-9 continuation operator invariants


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), blacklist_characters="\x00"
            ),
            max_size=120,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_cdc_chunks_reassemble_exactly(spark, texts):
    """CDC chunking is a PARTITION of the document: concatenating the
    chunks in chunk_id order reproduces every non-empty document
    byte-for-byte (unicode included), and empty documents emit no
    chunks."""
    from ontario_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got: dict[int, list] = {i: [] for i in range(len(texts))}
    for r in cdc_chunks(df, "doc_id", "text").collect():
        got[r["id"]].append((r["chunk_id"], r["chunk_text"]))
    for i, text in enumerate(texts):
        joined = "".join(c for _, c in sorted(got[i]))
        assert joined == text
        assert all(c != "" for _, c in got[i])


@settings(max_examples=20, deadline=None)
@given(
    st.text(alphabet="abxyz019.-_&=/:#?", max_size=40),
)
def test_canonical_url_is_idempotent(spark, tail):
    """Canonicalizing a canonical URL is a no-op — the defining
    property of a canonical form (otherwise two passes over the same
    crawl disagree on keys)."""
    from pyspark.sql import functions as F

    from ontario_spark.operators.textops import canonical_url

    url = "https://Host.Example.com:443/" + tail
    df = spark.createDataFrame([(url,)], ["u"])
    once = df.select(canonical_url(F.col("u")).alias("c"))
    twice = once.select(canonical_url(F.col("c")).alias("c"))
    a = once.collect()[0]["c"]
    b = twice.collect()[0]["c"]
    if a is not None:
        assert a == b


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_bpe_train_matches_textbook_reference(spark, words, rounds):
    """The distributed BPE trainer against a ~20-line pure-Python
    textbook implementation (count adjacent symbol pairs over word
    frequencies, argmax with (count desc, pair asc) tiebreak, greedy
    left-to-right non-overlapping apply, recount) on random tiny
    corpora — merges AND counts must agree round-for-round. The tiny
    'ab' alphabet maximizes chained-merge/tiebreak collisions, the
    cases a hand-picked fixture misses."""
    from collections import Counter

    from ontario_spark.operators.textops import bpe_train_merges

    freq = Counter(w for w in words if len(w) >= 2)
    seqs = {w: tuple(w) for w in freq}

    def ref_merges():
        out = []
        nonlocal seqs
        for _ in range(rounds):
            pc: Counter = Counter()
            for w, syms in seqs.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += freq[w]
            if not pc:
                break
            (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((l, r, c))
            nxt = {}
            for w, syms in seqs.items():
                merged, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        merged.append(l + r)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                nxt[w] = tuple(merged)
            seqs = nxt
        return out

    want = ref_merges()
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], ["doc_id", "text"]
    )
    got = [
        (r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train_merges(df, "text", rounds=rounds)
        .orderBy("merge_rank")
        .collect()
    ]
    # the distributed form emits one row per round even when the pair
    # table empties (it reports no row then); truncate to the shorter
    assert got[: len(want)] == want
    assert len(got) <= rounds


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc ", min_size=4, max_size=30),
        min_size=2,
        max_size=10,
    )
)
def test_banded_verified_jaccard_subset_of_exact(spark, texts):
    """The high-recall registry tier's safety property on random
    corpora: banded-verified pairs are ALWAYS a subset of the exact
    self-join's pairs with identical scores (banding can miss, the
    exact verify can never invent or mis-score) — including degenerate
    docs (all-space, repeated words, shared shingles everywhere)."""
    from ontario_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    exact = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 10)
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.35
        ).collect()
    }
    banded = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 10)
        for r in dedup.lsh_verified_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.35,
            num_hashes=48, bands=24,
        ).collect()
    }
    assert set(banded) <= set(exact)
    assert all(exact[p] == s for p, s in banded.items())


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="ab cd", min_size=0, max_size=20),
            st.sampled_from(["s1", "s2"]),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=7),
)
def test_token_packing_invariants(spark, rows, seq_len):
    """Concat-and-chunk invariants on random corpora: per stratum the
    token stream is covered exactly once (offsets chain: each doc
    starts where the previous ended, mod nothing), offsets live in
    [0, seq_len), pack spans are contiguous and non-decreasing, and
    the final pack index equals floor((total-1)/seq_len)."""
    from ontario_spark.operators.sampling import token_packing

    df = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows)],
        ["doc_id", "text", "source"],
    )
    out = sorted(
        token_packing(df, "doc_id", "text", "source", seq_len=seq_len).collect(),
        key=lambda r: (r["source"], r["doc_id"]),
    )
    by_stratum: dict = {}
    for r in out:
        by_stratum.setdefault(r["source"], []).append(r)
    for docs in by_stratum.values():
        pos = 0
        for r in docs:
            assert 0 <= r["pack_offset"] < seq_len
            assert r["pack_first"] == pos // seq_len
            assert r["pack_offset"] == pos % seq_len
            end = pos + r["n_tokens"]
            assert r["pack_last"] == (end - 1) // seq_len
            assert r["pack_last"] >= r["pack_first"]
            pos = end
        assert docs[-1]["pack_last"] == (pos - 1) // seq_len

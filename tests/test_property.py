"""Property-based tests (hypothesis) for the pure kernels — the
upgrade of the reference's stubbed property suite
(``test/property/test-index.ts:9-21`` is ``testProp.skip``).

No Ray involvement: these cover the codec, segmented helpers, term
encoding, tokenizer equivalence and top-k selection that the
distributed stages are built from.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

# the sandbox throttles first-run compute per process — wall-clock
# deadlines are meaningless here
settings.register_profile("sandbox", deadline=None)
settings.load_profile("sandbox")

from yaii_ray import codec, scoring
from yaii_ray.analysis import terms as T
from yaii_ray.analysis.tokenizer import tokenize_string, tokenize_strings
from yaii_ray.stages.termize import _number_terms_vectorized

u64s = st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200)


@given(u64s)
def test_vbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (codec.vbyte_decode(codec.vbyte_encode(arr), arr.size) == arr).all()


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200, unique=True))
def test_delta_docs_roundtrip(vals):
    arr = np.sort(np.array(vals, dtype=np.uint64))
    out = codec.delta_decode_docs(codec.delta_encode_docs(arr), arr.size)
    assert (out == arr).all()


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=30, unique=True),
        min_size=1,
        max_size=20,
    )
)
def test_segmented_helpers_roundtrip(groups):
    groups = [np.sort(np.array(g, dtype=np.uint64)) for g in groups]
    concat = np.concatenate(groups)
    sizes = np.array([g.size for g in groups])
    starts = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    gaps = codec.segmented_gaps(concat, starts)
    back = codec.segmented_undelta(gaps, starts)
    assert (back == concat).all()
    payload, nb = codec.vbyte_encode_with_lengths(gaps)
    cells = codec.binary_cells_from_lengths(payload, nb, starts)
    for i, g in enumerate(groups):
        got = codec.delta_decode_docs(cells[i].as_py(), g.size)
        assert (got == g).all()


@given(st.integers(min_value=T.MIN_SAFE_INTEGER, max_value=T.MAX_SAFE_INTEGER))
def test_number_terms_vectorized_matches_scalar(v):
    flat, counts = _number_terms_vectorized(np.array([v], dtype=np.int64))
    l0, l8 = flat.to_pylist()
    ref = T.number_to_terms(v)
    assert l0 == ref[0]
    assert l8 == ref[8]


@given(st.tuples(
    st.integers(min_value=T.MIN_SAFE_INTEGER, max_value=T.MAX_SAFE_INTEGER),
    st.integers(min_value=T.MIN_SAFE_INTEGER, max_value=T.MAX_SAFE_INTEGER),
))
def test_l8_term_order_is_numeric_order(pair):
    """Lexicographic L8-term order == numeric order of the 64-value
    BUCKETS (values in the same bucket share their L8 term) — the
    property the sorted-dictionary range scan relies on."""
    a, b = pair
    pa_, pb_ = (a + T.NUMBER_SHIFT) >> 6, (b + T.NUMBER_SHIFT) >> 6
    ta, tb = T.number_to_terms(a)[8], T.number_to_terms(b)[8]
    assert (pa_ < pb_) == (ta < tb)
    assert (pa_ == pb_) == (ta == tb)


# codepoints below U+0130: 'İ' and friends lowercase differently under
# full (Python/JS) vs simple (Arrow utf8_lower) case mapping — the
# known, documented divergence (analysis/tokenizer.py)
texts = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x12F), max_size=40),
    max_size=20,
)


@given(texts, st.booleans())
@settings(max_examples=60)
def test_vectorized_tokenizer_matches_scalar(rows, stop):
    arr = pa.array(rows, type=pa.string())
    vec = tokenize_strings(arr, stopwords=stop).to_pylist()
    ref = [tokenize_string(s, stopwords=stop) for s in rows]
    assert vec == ref


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**6), st.floats(min_value=0, max_value=100, allow_nan=False)),
        max_size=200,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=20),
)
def test_topk_matches_naive(pairs, k):
    docs = np.array([p[0] for p in pairs], dtype=np.uint64)
    scores = np.array([p[1] for p in pairs], dtype=np.float64)
    got_d, got_s = scoring.topk(docs, scores, k)
    order = sorted(range(len(pairs)), key=lambda i: (-scores[i], docs[i]))[:k]
    assert got_d.tolist() == [int(docs[i]) for i in order]
    assert got_s.tolist() == [float(scores[i]) for i in order]

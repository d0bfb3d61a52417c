"""Property-based codec tests (SURVEY.md §5.2.3) — pure python, no Spark."""

import numpy as np
import pytest

from open_source_search_engine_spark.functions import codec

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

pytestmark = pytest.mark.skipif(not HAVE_HYP, reason="hypothesis unavailable")


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=0,
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_any_int64(vals):
    a = np.array(sorted(set(vals)), dtype=np.int64)
    # canonical sorted order == shifted-uint64 order
    u = a.astype(np.uint64) + np.uint64(1 << 63)
    a = a[np.argsort(u)]
    enc = codec.encode_varint(codec.delta_encode(a))
    dec = codec.delta_decode(codec.decode_varint(enc, len(a)))
    assert np.array_equal(dec, a)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_unsigned(vals):
    a = np.array(vals, dtype=np.uint64)
    out = codec.decode_varint(codec.encode_varint(a), len(a))
    assert np.array_equal(out.astype(np.uint64), a)


@given(
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=100, deadline=None)
def test_postings_block_roundtrip_prop(n_docs, max_tf, seed):
    rng = np.random.default_rng(seed)
    doc_ids = np.sort(
        rng.choice(2**40, size=n_docs, replace=False).astype(np.int64)
    )
    tfs = rng.integers(1, max_tf + 1, size=n_docs)
    bounds = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(tfs[:-1], out=bounds[1:])
    pos = np.concatenate([np.sort(rng.integers(0, 4000, size=t)) for t in tfs])
    d_enc, t_enc, p_enc = codec.encode_postings_block(doc_ids, tfs, pos, bounds)
    d2, t2, p2, b2 = codec.decode_postings_block(d_enc, t_enc, p_enc, n_docs)
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(t2, tfs)
    assert np.array_equal(p2, pos)
    assert np.array_equal(b2, bounds)

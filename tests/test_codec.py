"""Delta+VByte codec: golden vectors + property roundtrips."""

import numpy as np
from hypothesis import given, settings, strategies as st

from yaii_ray import codec


class TestVByteGoldens:
    def test_small_values(self):
        assert codec.vbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
        assert codec.vbyte_encode(np.array([1], dtype=np.uint64)) == b"\x01"
        assert codec.vbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
        # 128 = 0b1000_0000 -> [0x80, 0x01]
        assert codec.vbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
        assert codec.vbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"

    def test_multi(self):
        buf = codec.vbyte_encode(np.array([1, 128, 0], dtype=np.uint64))
        assert buf == b"\x01\x80\x01\x00"
        out = codec.vbyte_decode(buf)
        assert out.tolist() == [1, 128, 0]

    def test_u64_max(self):
        v = np.array([2**64 - 1], dtype=np.uint64)
        assert codec.vbyte_decode(codec.vbyte_encode(v)).tolist() == v.tolist()

    def test_empty(self):
        assert codec.vbyte_encode(np.zeros(0, dtype=np.uint64)) == b""
        assert codec.vbyte_decode(b"").size == 0


class TestDeltaDocs:
    def test_dense_run_compresses_to_one_byte_per_doc(self):
        ids = np.arange(1000, dtype=np.uint64)
        buf = codec.delta_encode_docs(ids)
        assert len(buf) == 1000  # gap-1 == 0 for dense runs
        assert np.array_equal(codec.delta_decode_docs(buf), ids)

    def test_count_check(self):
        ids = np.array([5, 10, 1000000], dtype=np.uint64)
        buf = codec.delta_encode_docs(ids)
        assert np.array_equal(codec.delta_decode_docs(buf, 3), ids)

    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**53), min_size=1, max_size=200, unique=True
        )
    )
    @settings(max_examples=50)
    def test_roundtrip(self, vals):
        ids = np.array(sorted(vals), dtype=np.uint64)
        assert np.array_equal(codec.delta_decode_docs(codec.delta_encode_docs(ids)), ids)


class TestTfs:
    @given(st.lists(st.integers(min_value=1, max_value=10000), max_size=100))
    @settings(max_examples=50)
    def test_roundtrip(self, vals):
        tfs = np.array(vals, dtype=np.uint64)
        assert np.array_equal(codec.decode_tfs(codec.encode_tfs(tfs)), tfs)

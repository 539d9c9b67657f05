"""Cassandra Murmur3Partitioner parity (functions/murmur3.py).

The hash vectors are the PUBLIC unit-test vectors of the DataStax/Apache
cassandra python-driver (tests/unit/test_murmur3.py) — matching all of
them pins the Cassandra variant (signed-tail) exactly.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.functions.murmur3 import (
    LONG_MAX,
    LONG_MIN,
    _to_signed,
    murmur3_token,
    murmur3_token_of_bytes,
    murmur3_x64_128_cassandra,
    serialize_component,
    serialize_pk,
)


def _h1(data: bytes) -> int:
    return _to_signed(murmur3_x64_128_cassandra(data)[0])


class TestHashVectors:
    def test_public_driver_vectors(self):
        # cassandra python-driver tests/unit/test_murmur3.py
        assert _h1(b"") == 0
        assert _h1(b"\x00\xff\x10\xfa\x99" * 10) == 5837342703291459765
        assert _h1(b"\xfe" * 8) == -8927430733708461935
        assert _h1(b"\x10" * 8) == 1446172840243228796
        assert _h1(b"123") == -7468325962851647638

    def test_signed_tail_divergence_from_canonical(self):
        # canonical murmur3 treats tail bytes unsigned; Cassandra
        # sign-extends them. A high-bit tail byte must therefore produce
        # a DIFFERENT hash than the canonical tail handling would — this
        # guards against "fixing" the quirk away.
        data = b"\xff"  # 1-byte tail, high bit set
        h_cassandra = murmur3_x64_128_cassandra(data)[0]

        # canonical tail: k1 ^= tail[0] & 0xff
        k1 = 0xFF
        c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
        m = (1 << 64) - 1
        k1 = (k1 * c1) & m
        k1 = ((k1 << 31) | (k1 >> 33)) & m
        k1 = (k1 * c2) & m
        h1 = k1  # h1 was 0
        h1 ^= 1
        h2 = 1
        h1 = (h1 + h2) & m
        h2 = (h2 + h1) & m

        def fmix(k):
            k ^= k >> 33
            k = (k * 0xFF51AFD7ED558CCD) & m
            k ^= k >> 33
            k = (k * 0xC4CEB9FE1A85EC53) & m
            k ^= k >> 33
            return k

        h1, h2 = fmix(h1), fmix(h2)
        h1 = (h1 + h2) & m
        h_canonical = h1
        assert h_cassandra != h_canonical

    def test_min_token_normalized(self):
        assert murmur3_token_of_bytes(b"123") == _h1(b"123")
        # the normalization rule itself (partitioners exclude LONG_MIN)
        assert LONG_MIN not in (
            murmur3_token_of_bytes(struct.pack(">q", k)) for k in range(1000)
        )


class TestSerialization:
    def test_component_shapes(self):
        assert serialize_component(1, "bigint") == b"\x00" * 7 + b"\x01"
        assert serialize_component(-1, "bigint") == b"\xff" * 8
        assert serialize_component(1, "int") == b"\x00\x00\x00\x01"
        assert serialize_component("abc", "text") == b"abc"
        assert serialize_component(True, "boolean") == b"\x01"
        with pytest.raises(ValueError):
            serialize_component(None, "bigint")
        with pytest.raises(ValueError):
            serialize_component(1, "list<int>")

    def test_composite_envelope(self):
        # single component: raw bytes; composite: len16 + bytes + 0x00
        assert serialize_pk((5,), ["bigint"]) == struct.pack(">q", 5)
        two = serialize_pk((5, "ab"), ["bigint", "text"])
        assert two == b"\x00\x08" + struct.pack(">q", 5) + b"\x00" + b"\x00\x02ab\x00"

    def test_tokens_deterministic_and_spread(self):
        toks = [
            murmur3_token_of_bytes(struct.pack(">q", k)) for k in range(2000)
        ]
        assert toks == [
            murmur3_token_of_bytes(struct.pack(">q", k)) for k in range(2000)
        ]
        assert all(LONG_MIN < t <= LONG_MAX for t in toks)
        neg = sum(1 for t in toks if t < 0)
        assert 700 < neg < 1300  # roughly uniform over the ring


class TestColumnPath:
    def test_udf_matches_pure_python(self, spark):
        df = spark.range(100).select(F.col("id").alias("k"))
        rows = df.withColumn(
            "tok", murmur3_token(["k"], ["bigint"])
        ).collect()
        for r in rows:
            assert r.tok == murmur3_token_of_bytes(struct.pack(">q", r.k))

    def test_token_expr_partitioner_switch(self, spark):
        from cassandra_diff_spark.functions.keys import token_expr

        df = spark.range(10).select(F.col("id").alias("k"))
        mm = df.select(
            token_expr(["k"], partitioner="murmur3", cql_types=["bigint"]).alias("t")
        ).collect()
        assert mm[0].t == murmur3_token_of_bytes(struct.pack(">q", 0))
        with pytest.raises(ValueError, match="cql_types"):
            token_expr(["k"], partitioner="murmur3")
        with pytest.raises(ValueError, match="partitioner"):
            token_expr(["k"], partitioner="bogus")

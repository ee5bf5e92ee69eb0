"""ops/lits.py: the one-py4j-call literal builders must be
value- and type-identical to the per-element ``F.lit`` construction
they replaced (r12 driver-time optimization)."""

import struct

import pytest
from pyspark.sql import functions as F

from hudi_utility_spark.ops import lits


def _bits(x: float) -> bytes:
    return struct.pack(">d", x)


@pytest.fixture(scope="module")
def spark():
    from hudi_utility_spark.session import get_spark

    return get_spark("test-lits")


def test_array_double_bit_identical(spark):
    vals = [
        0.1 + 0.2, -0.0, 2.0, 1e-300, 1.5e300, 1e16, -3.14e-7,
        123456.789012345, -1.0 / 3.0,
    ]
    old = F.array(*[F.lit(float(x)) for x in vals])
    new = lits.array_double(vals)
    df = spark.range(1).select(old.alias("o"), new.alias("n"))
    assert df.schema["o"].dataType == df.schema["n"].dataType
    r = df.first()
    assert [_bits(x) for x in r.o] == [_bits(x) for x in r.n]


def test_array_struct_cid_c_matches_legacy_shape(spark):
    cents = [[1.5, -2.25, 1e-9], [0.0, 3.0, -0.5]]
    old = F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("c"),
            )
            for cid, vec in enumerate(cents)
        ]
    )
    new = lits.array_struct_cid_c(cents)
    df = spark.range(1).select(old.alias("o"), new.alias("n"))
    assert df.schema["o"].dataType == df.schema["n"].dataType
    r = df.first()
    for a, b in zip(r.o, r.n):
        assert a.cid == b.cid
        assert [_bits(x) for x in a.c] == [_bits(x) for x in b.c]


def test_array_array_struct_matches_nested(spark):
    books = [[[1.0, 2.0], [3.0, 4.0]], [[-1.5, 0.25], [9.0, -9.0]]]
    r = (
        spark.range(1)
        .select(lits.array_array_struct_cid_c(books).alias("b"))
        .first()
    )
    got = [[(s.cid, list(s.c)) for s in book] for book in r.b]
    assert got == [
        [(i, v) for i, v in enumerate(book)] for book in books
    ]


def test_array_string_quoting(spark):
    items = ["the", "it's", "back\\slash", "plain"]
    r = (
        spark.range(1)
        .select(lits.array_string(items).alias("s"))
        .first()
    )
    assert list(r.s) == items

"""First100 set engine: the reference's documented API error cases
(reference readme.md:179-196) against the table-backed implementation."""

import pytest

from python_etl_rest_api_spark.operators.first100 import First100, ValidationError


@pytest.fixture()
def f100(spark):
    return First100(spark)


def test_extract_and_missing(f100):
    out = f100.extract(57)
    assert out == {"extracted": 57, "remaining_count": 99}
    assert f100.missing() == 57          # Gauss closed form
    assert f100.missing_via_set() == [57]  # alternate impl agrees


def test_extract_out_of_range_400(f100):
    with pytest.raises(ValidationError):
        f100.extract(0)
    with pytest.raises(ValidationError):
        f100.extract(101)
    with pytest.raises(ValidationError):
        f100.extract("57")
    with pytest.raises(ValidationError):
        f100.extract(True)   # bool is not a number here


def test_duplicate_extract_400(f100):
    f100.extract(10)
    with pytest.raises(ValidationError):
        f100.extract(10)


def test_missing_requires_exactly_one(f100):
    with pytest.raises(ValidationError):
        f100.missing()       # zero extracted
    f100.extract(1)
    f100.extract(2)
    with pytest.raises(ValidationError):
        f100.missing()       # two extracted
    assert f100.missing_via_set() == [1, 2]   # alternate impl has no precondition


def test_reset(f100):
    f100.extract(5)
    out = f100.reset()
    assert out["remaining_count"] == 100
    assert f100.remaining_df().count() == 100


def test_state_persists_across_instances(spark, tmp_path):
    path = str(tmp_path / "state")
    a = First100(spark, store_path=path)
    a.extract(42)
    b = First100(spark, store_path=path)   # fresh "worker"
    assert b.missing() == 42
    with pytest.raises(ValidationError):
        b.extract(42)                       # duplicate across workers


def test_concurrent_duplicate_adjudication(spark, tmp_path):
    """Two workers racing on the same number: appends are never clobbered
    and exactly one claim wins (read-after-write, smaller token)."""
    path = str(tmp_path / "race")
    a = First100(spark, store_path=path)
    b = First100(spark, store_path=path)
    a.extract(7)
    with pytest.raises(ValidationError):
        b.extract(7)          # b re-reads the store and sees a's claim
    # simulate the worst case: both wrote before either adjudicated
    b._append(7, "99999999999999999999-0")   # later token -> loser
    assert sorted({n for n, _ in a._read_store()}) == [7]
    assert a.missing() == 7   # duplicate claims collapse to one extraction


def test_writes_not_clobbered_across_workers(spark, tmp_path):
    path = str(tmp_path / "clobber")
    a = First100(spark, store_path=path)
    b = First100(spark, store_path=path)
    a.extract(10)
    b.extract(20)             # b must not wipe a's write
    c = First100(spark, store_path=path)
    assert c.missing_via_set() == [10, 20]
    a.reset()
    assert b.missing_via_set() == []


def test_constructor_bounds_state_size(spark):
    """The collect-per-operation store recipe is only valid because
    state is <= n rows by construction; n beyond MAX_N must be refused
    at construction (round-6 verdict directive)."""
    import pytest
    from python_etl_rest_api_spark.operators.first100 import MAX_N
    with pytest.raises(ValidationError, match="shuffled store"):
        First100(spark, n=MAX_N + 1)
    with pytest.raises(ValidationError):
        First100(spark, n=0)
    assert First100(spark, n=MAX_N).n == MAX_N

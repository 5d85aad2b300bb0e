"""Cross-engine portability invariants for every hash derivation the
oracles depend on: the Python (engine-side) integer derivations from md5
must equal the DuckDB SQL derivations bit-for-bit for arbitrary inputs.
These are the load-bearing facts behind the exact value-hash oracle
matches — tested directly so a drift shows up here, not as a mysterious
oracle mismatch.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from torchtrajectory_spark.operators.dedup import _MH_MOD, N_MINHASH
from torchtrajectory_spark.operators.kernels import val_of
from torchtrajectory_spark.plans.oracles_ext import _hex2int

TOKENS = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1, max_size=24,
)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=200, deadline=None)
@given(TOKENS)
def test_hex2int_matches_python(s):
    con = duckdb.connect()
    h = hashlib.md5(s.encode()).hexdigest()
    got8 = con.execute(
        f"SELECT {_hex2int('h', 1)} FROM (SELECT md5(?) AS h)", [s]
    ).fetchone()[0]
    assert got8 == int(h[:8], 16)
    got15 = con.execute(
        f"SELECT {_hex2int('h', 1, 15)} FROM (SELECT md5(?) AS h)", [s]
    ).fetchone()[0]
    assert got15 == int(h[:15], 16)
    # and the byte-level engine shortcut equals the hex parse
    dg = hashlib.md5(s.encode()).digest()
    assert int.from_bytes(dg[:4], "big") == int(h[:8], 16)
    assert int.from_bytes(dg[:8], "big") >> 4 == int(h[:15], 16)


@settings(max_examples=100, deadline=None)
@given(TOKENS)
def test_km_signature_values_match(s):
    """(h1 + i*h2) mod 2^32 identical in Python ints and DuckDB BIGINTs."""
    con = duckdb.connect()
    h = hashlib.md5(s.encode()).hexdigest()
    h1, h2 = int(h[:8], 16), int(h[8:16], 16)
    for i in range(N_MINHASH):
        sql = (f"SELECT ({_hex2int('h', 1)} + {i} * {_hex2int('h', 9)}) "
               f"% {_MH_MOD} FROM (SELECT md5(?) AS h)")
        assert con.execute(sql, [s]).fetchone()[0] == (h1 + i * h2) % _MH_MOD


@settings(max_examples=100, deadline=None)
@given(TOKENS)
def test_kernel_value_matches_sql(s):
    """val_of == the generated oracle value expression, as a double."""
    from torchtrajectory_spark.plans.oracles_sim import _VAL

    con = duckdb.connect()
    got = con.execute(
        f"SELECT {_VAL} FROM (SELECT ? AS t)", [s]
    ).fetchone()[0]
    assert got == val_of(s)


@settings(max_examples=60, deadline=None)
@given(TOKENS)
def test_simhash_bit_extraction_matches(s):
    """The engine's 60-bit int shift == the oracle's nibble arithmetic."""
    from torchtrajectory_spark.operators.dedup import SIMHASH_BITS

    h = hashlib.md5(s.encode()).hexdigest()
    h60 = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") >> 4
    for bit in range(0, SIMHASH_BITS, 7):
        nib = int(h[bit // 4], 16)
        oracle_bit = (nib >> (3 - bit % 4)) & 1
        engine_bit = (h60 >> (SIMHASH_BITS - 1 - bit)) & 1
        assert oracle_bit == engine_bit

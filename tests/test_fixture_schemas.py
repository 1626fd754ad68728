"""Early-warning gate for driver testdata regeneration.

The driver may regenerate /root/testdata between rounds with different
physical encodings (observed: events.ts flipped from TIMESTAMP(NANOS)
→ TIMESTAMP(MICROS) between rounds 1 and 2, silently breaking every
`ts div 1000` expression).  This test pins the LOGICAL schema the
engine depends on and names the normalization helper to update when a
column's physical type drifts again.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

#: column -> set of acceptable pyarrow type strings.  A set, not a
#: single value, wherever the engine normalizes the encoding itself
#: (io.epoch_us / streaming.with_event_time handle every listed ts
#: encoding; anything OUTSIDE the set is genuinely unsupported).
EXPECTED = {
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_quantity": {"double", "int64"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_returnflag": {"string", "large_string"},
        "l_linestatus": {"string", "large_string"},
        "l_shipdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
    },
    "events": {
        "event_id": {"int64"},
        # io.epoch_us tolerates legacy nanos-long too, but the streaming
        # read schema (streaming.EVENTS_STREAM_SCHEMA) pins TIMESTAMP_NTZ
        # — if the driver flips the encoding again this gate must FAIL
        # loudly so both sites get extended together
        "ts": {"timestamp[us]"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32", "int64"},
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema_pinned(sf_dir, table):
    schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
    actual = {f.name: str(f.type) for f in schema}
    for col, accepted in EXPECTED[table].items():
        assert col in actual, (
            f"{table}.{col} missing — driver regenerated testdata with a "
            f"different layout; re-survey {sf_dir} and update the engine."
        )
        assert actual[col] in accepted, (
            f"{table}.{col} is {actual[col]}, engine supports {accepted}. "
            "If this is a new event-time encoding, extend io.epoch_us / "
            "streaming.with_event_time; otherwise update the reader."
        )

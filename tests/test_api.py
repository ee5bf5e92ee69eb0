"""Engine facade: reference-endpoint parity in one object."""

from __future__ import annotations

import pytest

from hudi_utility_spark.api import Engine
from hudi_utility_spark.validate import BootstrapRequest, ValidationError


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "ledger"))


def _request(sf_dir, tmp_path, **over):
    base = dict(
        data_file_path=f"{sf_dir}/events.parquet",
        table_name="events",
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        output_path=str(tmp_path / "events_table"),
    )
    base.update(over)
    return BootstrapRequest(**base)


def test_bootstrap_history_status_roundtrip(engine, sf_dir, tmp_path):
    events = []
    engine.subscribe(
        None, lambda payload: events.append((payload["transaction_id"], payload["status"]))
    )
    result = engine.bootstrap(_request(sf_dir, tmp_path))
    assert result["status"] == "SUCCESS"

    hist = engine.history().collect()
    assert len(hist) == 1 and hist[0].status == "SUCCESS"

    tid = hist[0].transaction_id
    st = engine.status(tid)
    assert st["status"] == "SUCCESS"
    assert st["record_counts"]["input"] == st["record_counts"]["destination"] > 0

    # observer saw PENDING then SUCCESS for this transaction
    assert [s for t, s in events if t == tid] == ["PENDING", "SUCCESS"]

    assert engine.status("nope-123") is None


def test_bootstrap_accepts_dict_and_validates(engine, tmp_path):
    with pytest.raises(ValidationError):
        engine.bootstrap(
            dict(
                data_file_path="/does/not/exist",
                table_name="x",
                record_key=["k"],
                precombine="p",
                output_path=str(tmp_path / "x"),
            )
        )
    # the failure is ledgered
    assert engine.history().filter("status = 'FAILED'").count() == 1


def test_resolve_path(engine, sf_dir):
    info = engine.resolve(f"{sf_dir}/events.parquet")
    assert info.is_path and info.data_format == "parquet"


def test_rerun_replays_stored_request(engine, sf_dir, tmp_path):
    engine.bootstrap(_request(sf_dir, tmp_path))
    tid = engine.history().collect()[0].transaction_id
    result = engine.rerun(tid)
    assert result["status"] == "SUCCESS"
    assert engine.history().count() == 2
    with pytest.raises(KeyError):
        engine.rerun("missing-tid")

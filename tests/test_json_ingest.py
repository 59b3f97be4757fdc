"""JSON-ingest validation: corrupt-record routing, MapType open-key rules,
and the reference's 14-type discriminated-union event contract
(ref: transcription/schemas/stream_event.schema.json:54-195)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from slower_whisper_spark import ConstraintSuite
from slower_whisper_spark.rules import (
    DiscriminatedUnion,
    JsonParsable,
    MapKeysAllowed,
    MapValueRange,
    parse_json_column,
)


def test_parse_json_column_routes_corrupt(spark):
    df = spark.createDataFrame(
        [
            (1, '{"k": 5, "name": "a"}'),
            (2, '{"k": broken'),
            (3, '{"k": 7}'),
            (4, "not json at all"),
        ],
        "id long, payload string",
    )
    p = parse_json_column(df, "payload", "k INT, name STRING").select("id", "parsed.*")
    rows = {r["id"]: r for r in p.collect()}
    assert rows[1]["k"] == 5 and rows[1]["_corrupt_record"] is None
    assert rows[2]["k"] is None and rows[2]["_corrupt_record"] == '{"k": broken'
    assert rows[3]["k"] == 7 and rows[3]["_corrupt_record"] is None
    assert rows[4]["_corrupt_record"] == "not json at all"


def test_json_rules_fold_into_suite_pass(spark):
    """The JSON rules are RowRules: they must run inside the suite's single
    wide pass-1 scan and produce exact violation counts."""
    rows = [
        (1, "p0", '{"k": 5}'),
        (2, "p0", '{"k'),  # corrupt
        (3, "p0", '{"k": 5, "zz": 1}'),  # open key
        (4, "p1", '{"k": 500}'),  # value out of range
        (5, "p1", '{"k": 9}'),
    ]
    df = spark.createDataFrame(rows, "id long, part string, payload string")
    suite = ConstraintSuite(
        "json",
        [
            JsonParsable("payload", "k INT", rule_id="parsable"),
            MapKeysAllowed("from_json(payload, 'map<string,int>')", ["k"], rule_id="keys"),
            MapValueRange("from_json(payload, 'map<string,int>')", 0, 99, rule_id="vals"),
        ],
    )
    res = suite.validate(df, key_col="id", partition_col="part", violation_limit=100)
    counts = {
        (r["partition"], r["rule_id"]): r["violations"]
        for r in res.verdicts.collect()
    }
    assert counts[("p0", "parsable")] == 1
    assert counts[("p0", "keys")] == 1
    assert counts[("p1", "vals")] == 1
    assert counts[("p1", "parsable")] == 0
    viol = {(r["key"], r["rule_id"]) for r in res.violations.collect()}
    assert ("2", "parsable") in viol and ("3", "keys") in viol and ("4", "vals") in viol


# the 14 server-message types of the reference's stream-event contract
# (stream_event.schema.json: SESSION_STARTED..PONG) with a payload check per
# type where the schema requires payload fields
STREAM_EVENT_BRANCHES = {
    "SESSION_STARTED": "payload_json.session_id IS NOT NULL",
    "SESSION_ENDED": "payload_json.stats_chunks >= 0",
    "PARTIAL": "payload_json.segment_id IS NOT NULL",
    "FINALIZED": "payload_json.segment_id IS NOT NULL AND payload_json.t1 >= payload_json.t0",
    "VAD_ACTIVITY": "payload_json.active IS NOT NULL",
    "BARGE_IN": "payload_json.at_ms >= 0",
    "END_OF_TURN_HINT": "payload_json.confidence BETWEEN 0 AND 1",
    "SPEAKER_TURN": "payload_json.speaker IS NOT NULL",
    "DIARIZATION_UPDATE": "payload_json.n_speakers >= 1",
    "SEMANTIC_UPDATE": None,
    "PHYSICS_UPDATE": None,
    "AUDIO_HEALTH": "payload_json.rms >= 0",
    "ERROR": "payload_json.code IS NOT NULL",
    "PONG": None,
}

PAYLOAD_DDL = (
    "session_id STRING, stats_chunks INT, segment_id STRING, t0 DOUBLE, t1 DOUBLE, "
    "active BOOLEAN, at_ms INT, confidence DOUBLE, speaker STRING, n_speakers INT, "
    "rms DOUBLE, code STRING"
)


def _mk_event(i, etype, payload):
    return (i, etype, json.dumps(payload))


def test_stream_event_14_type_discriminated_union(spark):
    """Mirror of the reference's PARTIAL/FINALIZED/... union: one good event
    per type, plus targeted violations (bad payload for a declared type,
    undeclared type, inverted segment bounds)."""
    good = [
        _mk_event(0, "SESSION_STARTED", {"session_id": "s1"}),
        _mk_event(1, "SESSION_ENDED", {"stats_chunks": 42}),
        _mk_event(2, "PARTIAL", {"segment_id": "seg1", "t0": 0.0, "t1": 1.5}),
        _mk_event(3, "FINALIZED", {"segment_id": "seg1", "t0": 0.0, "t1": 1.5}),
        _mk_event(4, "VAD_ACTIVITY", {"active": True}),
        _mk_event(5, "BARGE_IN", {"at_ms": 120}),
        _mk_event(6, "END_OF_TURN_HINT", {"confidence": 0.7}),
        _mk_event(7, "SPEAKER_TURN", {"speaker": "A"}),
        _mk_event(8, "DIARIZATION_UPDATE", {"n_speakers": 2}),
        _mk_event(9, "SEMANTIC_UPDATE", {}),
        _mk_event(10, "PHYSICS_UPDATE", {}),
        _mk_event(11, "AUDIO_HEALTH", {"rms": 0.1}),
        _mk_event(12, "ERROR", {"code": "E_TIMEOUT"}),
        _mk_event(13, "PONG", {}),
    ]
    bad = [
        _mk_event(100, "PARTIAL", {}),  # missing required segment_id
        _mk_event(101, "FINALIZED", {"segment_id": "s", "t0": 2.0, "t1": 1.0}),  # t1 < t0
        _mk_event(102, "NOT_A_TYPE", {}),  # undeclared type: closed union
        _mk_event(103, "END_OF_TURN_HINT", {"confidence": 1.5}),  # out of range
    ]
    df = spark.createDataFrame(good + bad, "event_id long, type string, payload string")
    df = df.withColumn("payload_json", F.from_json("payload", PAYLOAD_DDL))
    rule = DiscriminatedUnion("type", STREAM_EVENT_BRANCHES, rule_id="stream_union")
    out = df.select("event_id", rule.predicate().alias("ok")).collect()
    failures = sorted(r["event_id"] for r in out if not r["ok"])
    assert failures == [100, 101, 102, 103]
    assert len(STREAM_EVENT_BRANCHES) == 14  # full contract width


def test_json_rule_specs_roundtrip_through_migrate(spark):
    """spec() → suite_from_spec must rebuild identical-hash suites for all
    four JSON rule types."""
    from slower_whisper_spark.migrate import suite_from_spec

    suite = ConstraintSuite(
        "json-rt",
        [
            JsonParsable("payload", "k INT", rule_id="p"),
            MapKeysAllowed("from_json(payload, 'map<string,int>')", ["k"], rule_id="mk"),
            MapValueRange("from_json(payload, 'map<string,int>')", 0, 9, rule_id="mv"),
            DiscriminatedUnion("t", {"A": None, "B": "v >= 0"}, rule_id="du"),
        ],
    )
    rebuilt = suite_from_spec(suite.spec())
    assert rebuilt.suite_hash == suite.suite_hash

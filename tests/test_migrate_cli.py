"""Suite-version migration + CLI entry (ref test model: compat-shim tests,
SURVEY §5.4)."""

from __future__ import annotations

import json

import pytest

from slower_whisper_spark.migrate import (
    SuiteVersionError,
    auto_migrate,
    detect_version,
    suite_from_spec,
)

V1_SPEC = {
    "name": "legacy",
    "checks": [
        {"kind": "required", "col": "url"},
        {"kind": "regex", "col": "lang", "args": {"pattern": "^[a-z]{2}$"}},
        {"kind": "in_set", "col": "lang", "args": {"values": ["en", "fr"]}, "id": "lang_set"},
        {"kind": "bounds", "col": "n", "args": {"min": 0, "max": 10}},
    ],
}


def test_detect_version():
    assert detect_version(V1_SPEC) == 1
    assert detect_version({"version": 2, "rules": []}) == 2
    with pytest.raises(SuiteVersionError):
        detect_version({"foo": 1})


def test_v1_to_v2_migration_and_recompile(spark):
    v2 = auto_migrate(V1_SPEC, 2)
    assert v2["version"] == 2
    assert [r["type"] for r in v2["rules"]] == ["not_null", "pattern", "enum", "range"]
    suite = suite_from_spec(v2)
    assert suite.version == 2
    df = spark.createDataFrame(
        [("u1", "en", 5), ("u2", "english", 3), (None, "fr", 20)],
        "url string, lang string, n int",
    )
    res = suite.validate(df, key_col="url")
    viol = res.violations.toPandas()
    assert set(viol["rule_id"]) == {"not_null(url)", "pattern(lang)", "lang_set", "range(n)"}


def test_migrated_suite_runs_same_as_native(spark):
    """v1 suite through migration == directly-built v2 suite (same hash)."""
    from slower_whisper_spark import ConstraintSuite, Enum, NotNull, Pattern, Range

    native = ConstraintSuite(
        "legacy",
        [
            NotNull("url"),
            Pattern("lang", "^[a-z]{2}$"),
            Enum("lang", ["en", "fr"], rule_id="lang_set"),
            Range("n", min=0, max=10),
        ],
        version=2,
    )
    migrated = suite_from_spec(auto_migrate(V1_SPEC, 2))
    assert migrated.suite_hash == native.suite_hash


def test_cli_validate_roundtrip(tmp_path, docs_small, spark):
    from slower_whisper_spark.cli import main

    docs, _, _ = docs_small
    table = str(tmp_path / "docs")
    docs.write.mode("overwrite").partitionBy("warc_day").parquet(table)

    suite_path = tmp_path / "suite.json"
    suite_path.write_text(
        json.dumps(
            {
                "name": "cli-suite",
                "version": 2,
                "rules": [
                    {"type": "not_null", "column": "url", "rule_id": "not_null(url)"},
                    {
                        "type": "pattern",
                        "column": "lang",
                        "pattern": "^[a-z]{2}(-[A-Z]{2})?$",
                        "rule_id": "pattern(lang)",
                    },
                ],
            }
        )
    )
    # report mode: exit 0 even with violations
    assert main(["validate", table, "--suite", str(suite_path)]) == 0
    # gate mode: violations → exit 1
    assert main(["validate", table, "--suite", str(suite_path), "--gate"]) == 1
    # manifest mode with resume
    mdir = str(tmp_path / "manifest")
    assert main(["validate", table, "--suite", str(suite_path), "--manifest", mdir]) == 0


def test_detect_version_explicit_spec_format():
    """spec_format wins over structure: a hypothetical format-3 spec that
    still carries a 'rules' key must NOT be misdetected as 2 (ADVICE r2);
    a spec_format>=2 claim over v1 'checks' structure is a conflict."""
    assert detect_version({"spec_format": 3, "version": 3, "rules": []}) == 3
    assert detect_version({"spec_format": 2, "version": 1, "rules": []}) == 2
    with pytest.raises(SuiteVersionError):
        detect_version({"spec_format": 2, "checks": []})


def test_suite_spec_carries_spec_format(spark):
    from slower_whisper_spark import ConstraintSuite, NotNull

    s = ConstraintSuite("x", [NotNull("url")], version=7)
    spec = s.spec()
    assert spec["spec_format"] == 2 and spec["version"] == 7
    assert detect_version(spec) == 2

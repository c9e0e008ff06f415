"""JSONL ingest validation: malformed or field-missing lines must fail
at INGEST time, loudly — never land as all-null facts that only explode
at query time (PERMISSIVE-mode null-row poisoning)."""

import base64

import pytest

from factstore_spark.sources.jsonl import read_fact_inputs_jsonl


def _write(tmp_path, lines):
    p = tmp_path / "facts.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_valid_lines_round_trip(spark, tmp_path):
    payload = base64.b64encode(b"hello").decode()
    path = _write(
        tmp_path,
        [
            '{"type": "T1", "subject": " s1 ", "payload": "%s", "tags": {"k": "v"}}'
            % payload,
            '{"type": "T2", "subject": "s2"}',
        ],
    )
    rows = {r.subject: r for r in read_fact_inputs_jsonl(spark, path).collect()}
    assert rows["s1"].type == "T1" and bytes(rows["s1"].payload.data) == b"hello"
    assert rows["s1"].tags == {"k": "v"}
    assert rows["s2"].payload.data == bytearray(b"")


def test_malformed_json_line_fails_the_read(spark, tmp_path):
    path = _write(
        tmp_path,
        ['{"type": "T", "subject": "ok"}', '{"type": "T", "subject": trunca'],
    )
    with pytest.raises(Exception) as e:
        read_fact_inputs_jsonl(spark, path).collect()
    assert "FAILFAST" in str(e.value) or "Malformed" in str(e.value)


def test_missing_required_field_raises_at_ingest(spark, tmp_path):
    # well-formed JSON, but no "type": PERMISSIVE would yield a null —
    # the kept-column raise_error must fire instead
    path = _write(
        tmp_path,
        ['{"subject": "s-broken", "payload": null}'],
    )
    with pytest.raises(Exception) as e:
        read_fact_inputs_jsonl(spark, path).collect()
    assert "missing required 'type'" in str(e.value)


def test_blank_subject_raises_at_ingest(spark, tmp_path):
    path = _write(tmp_path, ['{"type": "T", "subject": "   "}'])
    with pytest.raises(Exception) as e:
        read_fact_inputs_jsonl(spark, path).collect()
    assert "missing required 'subject'" in str(e.value)


def test_type_and_subject_both_trimmed(spark, tmp_path):
    """type gets the same trim as subject — ' order ' passing
    validation verbatim would be missed by every type == 'order'
    filter downstream."""
    path = _write(tmp_path, ['{"type": " order ", "subject": " s1 "}'])
    row = read_fact_inputs_jsonl(spark, path).collect()[0]
    assert row.type == "order" and row.subject == "s1"

"""Append-tailing streaming DataSource: appends to an existing file are
streamed exactly once across checkpointed restarts — the capability
Spark's built-in file stream source lacks (it ingests whole files once
and never re-reads growth)."""

from __future__ import annotations

import os

from dso_import_spark.sources.tail_source import register_tail_source


def _append(path, lines):
    with open(path, "a") as f:
        for ln in lines:
            f.write(ln + "\n")


def _drain(spark, src_dir, ckpt, out_dir):
    """Drain to a parquet sink (the memory sink cannot recover from a
    checkpoint); returns rows of THIS batch only (delta vs before)."""
    before = set()
    if os.path.isdir(out_dir):
        before = {
            tuple(r) for r in spark.read.parquet(out_dir).collect()
        }
    q = (
        spark.readStream.format("eventtail")
        .load(src_dir)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    after = spark.read.parquet(out_dir)
    new = [r for r in after.collect() if tuple(r) not in before]
    return after, new


def test_tail_source_streams_appends_exactly_once(spark, tmp_path):
    register_tail_source(spark)
    src = tmp_path / "logs"
    src.mkdir()
    log = str(src / "events.log")
    ckpt = str(tmp_path / "ckpt")

    out_dir = str(tmp_path / "out")
    _append(log, ["1|10|view|0.5", "2|11|click|1.5"])
    _, new1 = _drain(spark, str(src), ckpt, out_dir)
    assert sorted(r.event_id for r in new1) == [1, 2]

    # append to the SAME file; a torn line (no newline) must wait
    _append(log, ["3|12|purchase|9.0"])
    with open(log, "a") as f:
        f.write("4|13|torn|1.0")  # no trailing newline yet
    _, new2 = _drain(spark, str(src), ckpt, out_dir)
    got2 = sorted(r.event_id for r in new2)
    assert got2 == [3], f"expected only the appended complete line, got {got2}"

    # newline lands -> the torn line is released, exactly once
    with open(log, "a") as f:
        f.write("\n")
    all3, new3 = _drain(spark, str(src), ckpt, out_dir)
    assert sorted(r.event_id for r in new3) == [4]
    # exactly-once overall: nothing duplicated across the three batches
    assert sorted(r.event_id for r in all3.collect()) == [1, 2, 3, 4]
    assert all3.schema.simpleString() == (
        "struct<event_id:bigint,user_id:bigint,event_type:string,value:double>"
    )


def test_tail_source_sees_new_files_too(spark, tmp_path):
    register_tail_source(spark)
    src = tmp_path / "logs2"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "out2")
    _append(str(src / "a.log"), ["1|1|view|1.0"])
    _drain(spark, str(src), ckpt, out_dir)
    _append(str(src / "b.log"), ["2|2|click|2.0"])
    _, new = _drain(spark, str(src), ckpt, out_dir)
    assert [r.event_id for r in new] == [2]


def test_tail_source_replays_after_copytruncate(spark, tmp_path):
    # logrotate copytruncate: the file shrinks in place and regrows
    # with NEW content. The committed offset points past the new
    # file's end; resuming there would lose the new head (and emit a
    # torn fragment once it regrows past the old offset — round-8
    # review). The reader must replay the new generation from byte 0.
    register_tail_source(spark)
    src = tmp_path / "logs3"
    src.mkdir()
    log = str(src / "app.log")
    ckpt = str(tmp_path / "ckpt3")
    out_dir = str(tmp_path / "out3")
    _append(log, ["1|1|view|1.0", "2|2|click|2.0"])
    _drain(spark, str(src), ckpt, out_dir)
    # copytruncate: truncate to zero, write new (shorter) content
    with open(log, "w") as f:
        f.write("3|3|purchase|9.0\n")
    _, new = _drain(spark, str(src), ckpt, out_dir)
    assert sorted(r.event_id for r in new) == [3]
    # and appends after the truncation keep streaming normally
    _append(log, ["4|4|view|1.5"])
    all3, new3 = _drain(spark, str(src), ckpt, out_dir)
    assert sorted(r.event_id for r in new3) == [4]
    assert sorted(r.event_id for r in all3.collect()) == [1, 2, 3, 4]


def test_tail_source_replays_truncate_regrow_past_offset(spark, tmp_path):
    # The pre-round-9 blind spot (ADVICE r8): each _drain is a fresh
    # query start, so the reader's in-memory generation tracker is
    # empty; if the file is truncated AND regrown PAST the committed
    # byte position between drains, neither the gen bump nor the
    # e_pos < s_pos shrink check can see it — only the head
    # fingerprint in the committed offset does. Without it the reader
    # resumes mid-file in the new generation and emits a torn
    # fragment of event 4.
    register_tail_source(spark)
    src = tmp_path / "logs4"
    src.mkdir()
    log = str(src / "app.log")
    ckpt = str(tmp_path / "ckpt4")
    out_dir = str(tmp_path / "out4")
    _append(log, ["1|1|view|1.0"])  # 13 bytes committed
    _drain(spark, str(src), ckpt, out_dir)
    # truncate, then regrow LONGER than the committed offset
    with open(log, "w") as f:
        f.write("3|3|purchase|9.0\n4|4|click|2.5\n5|5|view|1.0\n")
    _, new = _drain(spark, str(src), ckpt, out_dir)
    assert sorted(r.event_id for r in new) == [3, 4, 5]
    # appends keep streaming exactly-once afterwards
    _append(log, ["6|6|view|7.0"])
    all3, new3 = _drain(spark, str(src), ckpt, out_dir)
    assert sorted(r.event_id for r in new3) == [6]
    assert sorted(r.event_id for r in all3.collect()) == [1, 3, 4, 5, 6]


def test_transient_read_failure_is_unknown_not_truncation(tmp_path, monkeypatch):
    # a plan-time open() failure must RESUME from the committed
    # offset, never replay it (round-9 review: '' on OSError was
    # indistinguishable from truncation and duplicated committed rows)
    from dso_import_spark.sources import tail_source as ts

    log = tmp_path / "app.log"
    log.write_text("1|1|view|1.0\n2|2|click|2.0\n")
    reader = ts.TailStreamReader({"path": str(tmp_path)})
    start = reader.latestOffset()
    key = str(log)
    gen, pos, fplen, fp = start[key]
    assert fplen > 0 and fp  # healthy fingerprint committed
    log.write_text("1|1|view|1.0\n2|2|click|2.0\n3|3|view|3.0\n")
    end = reader.latestOffset()

    real_open = open

    def flaky_open(path, *a, **kw):
        if str(path) == key:
            raise OSError("transient EIO")
        return real_open(path, *a, **kw)

    monkeypatch.setattr("builtins.open", flaky_open)
    parts = reader.partitions(start, end)
    monkeypatch.undo()
    assert len(parts) == 1
    # resumes at the committed byte position — no replay-from-zero
    assert parts[0].start == pos
    assert parts[0].end == end[key][1]

    # and a latestOffset under the same failure holds position and
    # carries the last GOOD fingerprint forward (committing 0/'' would
    # erase the restart-proof truncation check for the file)
    monkeypatch.setattr("builtins.open", flaky_open)
    off = reader.latestOffset()
    monkeypatch.undo()
    assert off[key][1] == end[key][1]  # no forward progress claimed
    assert off[key][2] == end[key][2] and off[key][3] == end[key][3]

    # an unknown-unreadable file fails the poll loudly instead of
    # being silently omitted (an omitted committed file would replay
    # from byte 0 on the next successful poll)
    fresh = ts.TailStreamReader({"path": str(tmp_path)})
    monkeypatch.setattr("builtins.open", flaky_open)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="no prior state"):
        fresh.latestOffset()
    monkeypatch.undo()

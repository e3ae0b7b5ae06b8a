"""bench.py orchestration logic (no TPU): retry wrapper, result-line
format, and the partial-output salvage that keeps a banked point when a
sweep later hangs or crashes (VERDICT r2 #1: one transient failure must not
erase the flagship number)."""

import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_result_line_is_self_describing():
    line = bench._result_line("llmseg_7b", 4, 9.01, 0.665)
    d = json.loads(line)
    assert d["unit"] == "images/s" and d["value"] == 9.01
    assert "vs_baseline=mfu_v5e_bf16" in d["metric"]
    assert "batch4" in d["metric"]
    d8 = json.loads(bench._result_line("llmseg_7b", 8, 10.0, 0.6, ",int8"))
    assert "int8" in d8["metric"]
    dw = json.loads(bench._result_line(
        "llmseg_7b", 4, 12.0, 0.9, ",int8-w8a8,top1=1.000"))
    assert "int8-w8a8" in dw["metric"] and "top1=1.000" in dw["metric"]


def test_with_retry_retries_then_succeeds(monkeypatch):
    monkeypatch.setattr(bench, "RETRY_SLEEP_S", 0)
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED")
        return "ok"

    assert bench._with_retry("x", flaky) == "ok"
    assert len(calls) == 2
    assert bench._with_retry("y", lambda: 1 / 0) is None


def _stub(tmp_path, body):
    p = tmp_path / "stub.py"
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_subprocess_takes_last_banked_line(tmp_path, monkeypatch):
    stub = _stub(tmp_path, """
        print('{"metric": "m[batch4]", "value": 1.0}')
        print('{"metric": "m[batch8]", "value": 2.0}')
    """)
    monkeypatch.setattr(bench, "__file__", stub)
    line = bench._subprocess([])
    assert json.loads(line)["value"] == 2.0


def test_subprocess_salvages_banked_line_on_crash(tmp_path, monkeypatch):
    stub = _stub(tmp_path, """
        import sys
        print('{"metric": "m[batch4]", "value": 1.5}', flush=True)
        sys.exit(1)   # later batch point crashed AFTER banking
    """)
    monkeypatch.setattr(bench, "__file__", stub)
    line = bench._subprocess([])
    assert json.loads(line)["value"] == 1.5


def test_subprocess_salvages_on_timeout(tmp_path, monkeypatch):
    stub = _stub(tmp_path, """
        import time
        print('{"metric": "m[batch4]", "value": 3.0}', flush=True)
        time.sleep(120)   # wedged backend hang
    """)
    monkeypatch.setattr(bench, "__file__", stub)
    line = bench._subprocess([], timeout=15)   # ample: box has ONE cpu core
    assert json.loads(line)["value"] == 3.0


def test_subprocess_none_when_no_line(tmp_path, monkeypatch):
    stub = _stub(tmp_path, """
        import sys
        sys.exit(1)
    """)
    monkeypatch.setattr(bench, "__file__", stub)
    assert bench._subprocess([]) is None


def test_stream_subprocess_tees_banked_lines(tmp_path, monkeypatch, capfd):
    stub = _stub(tmp_path, """
        print('{"metric": "m[batch4]", "value": 1.0}', flush=True)
        print('{"metric": "m[batch8]", "value": 2.0}', flush=True)
    """)
    monkeypatch.setattr(bench, "__file__", stub)
    line = bench._subprocess([], stream=True)
    assert json.loads(line)["value"] == 2.0
    out = capfd.readouterr().out.splitlines()
    # both banked lines were tee'd to OUR stdout as they appeared
    assert [json.loads(ln)["value"] for ln in out] == [1.0, 2.0]


def test_stream_subprocess_salvages_on_timeout(tmp_path, monkeypatch, capfd):
    stub = _stub(tmp_path, """
        import time
        print('{"metric": "m[batch4]", "value": 3.0}', flush=True)
        time.sleep(120)   # wedged backend hang
    """)
    monkeypatch.setattr(bench, "__file__", stub)
    line = bench._subprocess([], timeout=15, stream=True)
    assert json.loads(line)["value"] == 3.0
    out = capfd.readouterr().out.splitlines()
    assert json.loads(out[-1])["value"] == 3.0


def test_last_good_bank_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "LAST_GOOD_PATH",
                        str(tmp_path / "last_good.json"))
    monkeypatch.setattr(bench, "HISTORY_PATH",
                        str(tmp_path / "history.jsonl"))
    assert bench._read_last_good() is None
    fb = json.loads(bench._fallback_line("backend_outage"))
    assert "last_known_good=none" in fb["metric"]
    assert fb["value"] == 0.0

    good = bench._result_line("llmseg_7b", 4, 12.16, 0.9,
                              ",int8-w8a8,top1=1.000")
    bench._write_last_good(good)
    assert bench._read_last_good()["value"] == 12.16
    fb = json.loads(bench._fallback_line("backend_outage"))
    assert "last_known_good=12.16_w8a8_batch4" in fb["metric"]

    # a zero-value line must never displace the banked good one
    bench._write_last_good(bench._fallback_line("x"))
    assert bench._read_last_good()["value"] == 12.16

    # monotonic: a lower measured value (e.g. a run whose W8A8 lane was
    # lost to a backend wedge, leaving only bf16) keeps the best bank
    bench._write_last_good(bench._result_line("llmseg_7b", 4, 8.98, 0.66))
    assert bench._read_last_good()["value"] == 12.16
    # a better value moves the bank forward
    bench._write_last_good(bench._result_line("llmseg_7b", 4, 13.5, 1.0,
                                              ",int8-w8a8,top1=1.000"))
    assert bench._read_last_good()["value"] == 13.5

    # every successful write is commit-stamped in the append-only history
    # (including the 8.98 run the monotonic bank refused) — the
    # round-over-round regression record (VERDICT r4 #7, ADVICE r4)
    hist = [json.loads(ln) for ln in open(bench.HISTORY_PATH)]
    assert [h["value"] for h in hist] == [12.16, 8.98, 13.5]
    assert all("commit" in h and "ts" in h for h in hist)
    assert bench._read_last_good().get("commit") == hist[-1]["commit"]


def test_tag_regression_marks_degraded_headline(tmp_path, monkeypatch):
    """A run whose best lane is >10% below the banked best must carry a
    regressed_from= tag in its own recorded line (VERDICT r4 #7): the
    monotonic bank stays, but the degradation is visible in the record."""
    monkeypatch.setattr(bench, "LAST_GOOD_PATH",
                        str(tmp_path / "last_good.json"))
    monkeypatch.setattr(bench, "HISTORY_PATH",
                        str(tmp_path / "history.jsonl"))
    good = bench._result_line("llmseg_7b", 4, 12.16, 0.9,
                              ",int8-w8a8,top1=1.000")
    # empty bank: no tag
    assert bench._tag_regression(good) == good
    bench._write_last_good(good)

    degraded = bench._result_line("llmseg_7b", 4, 8.98, 0.66)
    tagged = json.loads(bench._tag_regression(degraded))
    assert "regressed_from=12.16@" in tagged["metric"]
    assert tagged["value"] == 8.98          # value itself is untouched
    # within 10% of the bank: no tag
    near = bench._result_line("llmseg_7b", 4, 11.5, 0.85,
                              ",int8-w8a8,top1=1.000")
    assert bench._tag_regression(near) == near
    # None/garbage pass through
    assert bench._tag_regression(None) is None
    assert bench._tag_regression("not json") == "not json"


def test_orchestrate_degraded_run_records_regression(tmp_path, monkeypatch,
                                                     capsys):
    """Drive a degraded run end-to-end: the bank holds 12.16 from a prior
    round, every quantized lane fails today, bf16 lands 8.98 — the final
    headline must carry the regressed_from tag and the bank must keep the
    better value."""
    monkeypatch.setattr(bench, "LAST_GOOD_PATH",
                        str(tmp_path / "last_good.json"))
    monkeypatch.setattr(bench, "HISTORY_PATH",
                        str(tmp_path / "history.jsonl"))
    bench._write_last_good(bench._result_line(
        "llmseg_7b", 4, 12.16, 0.9, ",int8-w8a8,top1=1.000"))

    bf16 = bench._result_line("llmseg_7b", 4, 8.98, 0.66)

    def sub(argv, timeout=None, stream=False):
        if "--quant" in argv or "--tower" in argv or "--amg" in argv \
                or "--trainstep" in argv:
            return None
        return bf16

    monkeypatch.setattr(bench, "_subprocess", sub)
    monkeypatch.setattr(bench, "_probe_backend", lambda **k: True)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    rc = bench._orchestrate()
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    _assert_every_prefix_parseable(out)
    last = json.loads(out[-1])
    assert last["value"] == 8.98
    assert "regressed_from=12.16@" in last["metric"]
    assert bench._read_last_good()["value"] == 12.16   # bank unharmed


def _orchestrate_stubbed(monkeypatch, tmp_path, subprocess_fn, probe_fn):
    monkeypatch.setattr(bench, "LAST_GOOD_PATH",
                        str(tmp_path / "last_good.json"))
    monkeypatch.setattr(bench, "HISTORY_PATH",
                        str(tmp_path / "history.jsonl"))
    monkeypatch.setattr(bench, "_subprocess", subprocess_fn)
    monkeypatch.setattr(bench, "_probe_backend", probe_fn)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    return bench._orchestrate()


def _assert_every_prefix_parseable(out_lines):
    """The driver takes the LAST stdout line after a kill at ANY moment:
    every line the orchestrator prints must itself be valid JSON."""
    assert out_lines, "orchestrator printed nothing"
    for ln in out_lines:
        d = json.loads(ln)
        assert "metric" in d and "value" in d


def test_orchestrate_happy_path_banks_headline(tmp_path, monkeypatch,
                                               capsys):
    bf16 = bench._result_line("llmseg_7b", 4, 9.0, 0.66)
    int8 = bench._result_line("llmseg_7b", 8, 9.33, 0.69, ",int8")
    w8a8 = bench._result_line("llmseg_7b", 4, 12.16, 0.9,
                              ",int8-w8a8,top1=1.000")

    def sub(argv, timeout=None, stream=False):
        if "--tower" in argv:
            return None
        if "--w8a8" in argv:
            return w8a8
        if "--quant" in argv:
            return int8
        return bf16

    rc = _orchestrate_stubbed(monkeypatch, tmp_path, sub, lambda **k: True)
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    _assert_every_prefix_parseable(out)
    # first line lands before any lane; last line is the gated winner
    assert "no_lane_completed_yet" in out[0]
    assert json.loads(out[-1])["value"] == 12.16
    assert bench._read_last_good()["value"] == 12.16


def test_orchestrate_fails_fast_on_outage(tmp_path, monkeypatch, capsys):
    calls = []

    def sub(argv, timeout=None, stream=False):
        calls.append(argv)
        return None

    rc = _orchestrate_stubbed(monkeypatch, tmp_path, sub,
                              lambda **k: False)
    assert rc == 1
    assert calls == []          # no 40-minute lane against a dead backend
    out = capsys.readouterr().out.splitlines()
    _assert_every_prefix_parseable(out)
    assert "backend_outage" in out[-1]


def test_orchestrate_survives_kill_mid_lane(tmp_path, monkeypatch, capsys):
    """Simulate the driver SIGKILLing the orchestrator during the int8
    lane: everything already printed must end in a parseable line."""
    import pytest

    bf16 = bench._result_line("llmseg_7b", 4, 9.0, 0.66)

    def sub(argv, timeout=None, stream=False):
        if "--w8a8" in argv:
            return None               # W8A8 lane (first) found nothing
        if "--quant" in argv:
            raise KeyboardInterrupt   # stand-in for a kill
        return bf16

    with pytest.raises(KeyboardInterrupt):
        _orchestrate_stubbed(monkeypatch, tmp_path, sub, lambda **k: True)
    out = capsys.readouterr().out.splitlines()
    _assert_every_prefix_parseable(out)
    assert json.loads(out[-1])["value"] == 9.0   # best-so-far survived


def test_orchestrate_w8a8_gate_still_applies(tmp_path, monkeypatch,
                                             capsys):
    bf16 = bench._result_line("llmseg_7b", 4, 9.0, 0.66)
    w_bad = bench._result_line("llmseg_7b", 4, 12.0, 0.9,
                               ",int8-w8a8,top1=0.875")

    def sub(argv, timeout=None, stream=False):
        if "--tower" in argv or "--quant" in argv and "--w8a8" not in argv:
            return None
        if "--w8a8" in argv:
            return w_bad
        return bf16

    rc = _orchestrate_stubbed(monkeypatch, tmp_path, sub, lambda **k: True)
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    _assert_every_prefix_parseable(out)
    assert json.loads(out[-1])["value"] == 9.0   # inexact probe: no promo


def test_orchestrate_first_probe_gets_cold_budget(tmp_path, monkeypatch,
                                                  capsys):
    """A cold backend init takes 3-4 min through the tunnel (227 s measured
    2026-08-19): the FIRST probe must carry the cold-init budget, later
    probes the short default — else a healthy cold start reads as an
    outage and every lane is skipped."""
    budgets = []

    def probe(timeout=150):
        budgets.append(timeout)
        return True

    bf16 = bench._result_line("llmseg_7b", 4, 9.0, 0.66)
    _orchestrate_stubbed(monkeypatch, tmp_path, lambda *a, **k: bf16, probe)
    assert budgets[0] >= bench.COLD_PROBE_S
    assert all(b < bench.COLD_PROBE_S for b in budgets[1:])
    assert len(budgets) > 1     # later lanes still re-probe


def test_orchestrate_w8a8_lane_runs_before_int8(tmp_path, monkeypatch,
                                                capsys):
    """The W8A8 lane is the best lane (12+ img/s): on a short driver
    window it must get its measurement before the int8 capacity sweep."""
    order = []

    def sub(argv, timeout=None, stream=False):
        if "--valloop" in argv:
            order.append("valloop")
        elif "--amg" in argv:
            order.append("amg")
        elif "--trainstep" in argv:
            order.append("trainstep")
        elif "--tower" in argv:
            order.append("tower")
        elif "--w8a8" in argv:
            order.append("w8a8")
        elif "--quant" in argv:
            order.append("int8")
        else:
            order.append("bf16")
        return None

    _orchestrate_stubbed(monkeypatch, tmp_path, sub, lambda **k: True)
    # W8A8 is the very first lane: a short driver window records the
    # headline before anything else runs (observed 2026-08-19: a run that
    # led with bf16 lost the W8A8 lane to a post-lane backend wedge).
    # The BASELINE-config lanes (valloop, amg, trainstep — VERDICT r4
    # #2/#3/#5) run before the int8 capacity sweep and the tower
    # diagnostics, which come last.
    assert order[0] == "w8a8"
    for lane in ("valloop", "amg", "trainstep"):
        assert order.index(lane) < order.index("int8"), order
    assert order.index("int8") < order.index("tower"), order


def test_orchestrate_probe_retry_rescues_lane(tmp_path, monkeypatch,
                                              capsys):
    """The observed 2026-08-19 failure: after a big lane the backend
    wedges for a few minutes — two probes time out, a third succeeds.
    The pre-lane gate must retry through that window instead of
    permanently skipping the lane."""
    bf16 = bench._result_line("llmseg_7b", 4, 9.0, 0.66)
    ran = []

    def sub(argv, timeout=None, stream=False):
        if "--w8a8" in argv:
            ran.append("w8a8")
            return None
        if "--quant" in argv or "--tower" in argv:
            return None
        ran.append("bf16")
        return bf16

    seq = iter([True,          # initial cold probe
                False, False, True])   # bf16 gate: wedged, wedged, ok

    def probe(timeout=150):
        return next(seq, True)

    rc = _orchestrate_stubbed(monkeypatch, tmp_path, sub, probe)
    assert rc == 0
    assert "bf16" in ran        # the lane survived the transient wedge
    out = capsys.readouterr().out.splitlines()
    _assert_every_prefix_parseable(out)
    assert json.loads(out[-1])["value"] == 9.0


def test_run_valloop_tiny_cpu():
    """The --valloop lane end-to-end at tiny scale on CPU: compiles the
    eval step, runs the batched validation loop, returns a finite rate."""
    ips = bench.run_valloop("llmseg_tiny", val_batch=2, n_images=4)
    assert ips > 0


def test_pick_headline_gates_and_promotes():
    bf16 = bench._result_line("llmseg_7b", 4, 9.0, 0.66)
    int8 = bench._result_line("llmseg_7b", 4, 9.33, 0.69, ",int8")
    w_ok = bench._result_line("llmseg_7b", 4, 12.16, 0.90,
                              ",int8-w8a8,top1=1.000")
    w_bad = bench._result_line("llmseg_7b", 4, 12.16, 0.90,
                               ",int8-w8a8,top1=0.875")
    # best lane wins; W8A8 needs an exact probe
    assert bench._pick_headline(bf16, int8, w_ok) == w_ok
    assert bench._pick_headline(bf16, int8, w_bad) == int8
    assert bench._pick_headline(bf16, None, None) == bf16
    # W8A8 can carry the round when both other lanes failed (probe exact)
    assert bench._pick_headline(None, None, w_ok) == w_ok
    assert bench._pick_headline(None, None, w_bad) is None
    # int8 carries when bf16 failed; garbage lines never displace parsed
    assert bench._pick_headline(None, int8, None) == int8
    assert bench._pick_headline(bf16, "not json", None) == bf16
    # a slower W8A8 never displaces a faster reference-supported lane
    w_slow = bench._result_line("llmseg_7b", 4, 9.1, 0.67,
                                ",int8-w8a8,top1=1.000")
    assert bench._pick_headline(bf16, int8, w_slow) == int8


def test_run_trainstep_tiny_cpu():
    """The --trainstep lane end-to-end at tiny scale on CPU: quantize-in-
    init QLoRA layout, one compiled partitioned step, finite timing."""
    dt = bench.run_trainstep("llmseg_tiny", text_len=32)
    assert dt > 0


def test_run_amg_tiny_cpu():
    """The --amg lane end-to-end at tiny scale on CPU: pipelined
    submit/prefetch/finish with the survivor cap driving a full RLE load
    on every image."""
    ips, surv = bench.run_amg(n_images=3, survivors=4, model="tiny",
                              points_per_side=4)
    assert ips > 0
    assert surv == 4            # the opened gates give exactly max_masks

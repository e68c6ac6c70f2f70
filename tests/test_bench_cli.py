"""bench.py capture hardening: preflight retry-with-backoff, the last-good
sidecar, and the --repeat median protocol (VERDICT r3 items #1 and #6).

The round-3 official bench recorded 0.0 because a transient axon-tunnel
wedge failed ONE preflight probe; these tests pin the behavior that makes
that impossible again: the probe retries inside the watchdog budget, and
every error line carries the last successfully captured value.
"""

import json
import os
import subprocess
import sys
import time
from os.path import dirname, isfile, join

import pytest

ROOT = dirname(dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402


def test_preflight_retries_until_deadline(monkeypatch, capsys):
    """A failing probe is retried with backoff until the budget is spent;
    the terminal error JSON records the retry count."""
    monkeypatch.setattr(bench, "_PROBE", "import sys; sys.exit(1)")
    t0 = time.monotonic()
    ok = bench.preflight("m", timeout=5, deadline=t0 + 8.0, backoff=0.2)
    assert not ok
    assert time.monotonic() - t0 >= 0.5  # actually slept between probes
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0
    # >=2 proves the loop retried (python subprocess startup is ~1.3 s on
    # this 1-core host — an 8 s budget fits several probes even when a
    # background pytest run is hogging the core)
    assert out["preflight_retries"] >= 2
    assert "probe(s)" in out["error"]


def test_preflight_recovers_mid_budget(monkeypatch, capsys, tmp_path):
    """A probe that fails then succeeds returns True (measurement can
    proceed) — the transient-wedge scenario."""
    flag = tmp_path / "second_try"
    probe = (f"import os, sys; p = {str(flag)!r}; "
             "ok = os.path.exists(p); open(p, 'w').close(); "
             "sys.exit(0 if ok else 1)")
    monkeypatch.setattr(bench, "_PROBE", probe)
    ok = bench.preflight("m", timeout=10,
                         deadline=time.monotonic() + 30, backoff=0.1)
    assert ok
    assert capsys.readouterr().out == ""  # no error JSON on success


def test_last_good_sidecar_roundtrip(monkeypatch, capsys, tmp_path):
    side = str(tmp_path / "last_good.json")
    monkeypatch.setattr(bench, "_LAST_GOOD", side)
    bench._write_last_good("metric_a", 440.25, "samples/sec/chip")
    bench._write_last_good("metric_b", 39.8, "ms")
    lg = bench._read_last_good("metric_a")
    assert lg["value"] == 440.25 and lg["unit"] == "samples/sec/chip"
    assert "ts" in lg
    # the error line for metric_a quotes its own last-good, not metric_b's
    bench._emit_error("metric_a", "tunnel wedged", retries=7)
    out = json.loads(capsys.readouterr().out.strip())
    assert out["last_good"]["value"] == 440.25
    assert out["preflight_retries"] == 7
    assert "last good = 440.25 samples/sec/chip at" in out["error"]
    # unknown metric: no last_good key, error line unchanged
    bench._emit_error("metric_c", "tunnel wedged")
    out = json.loads(capsys.readouterr().out.strip())
    assert "last_good" not in out and out["error"] == "tunnel wedged"


def test_emit_error_survives_corrupt_sidecar(monkeypatch, capsys, tmp_path):
    side = tmp_path / "last_good.json"
    side.write_text("{not json")
    monkeypatch.setattr(bench, "_LAST_GOOD", str(side))
    bench._emit_error("m", "boom")
    out = json.loads(capsys.readouterr().out.strip())
    assert out["error"] == "boom"
    # and a fresh write replaces the corrupt file
    bench._write_last_good("m", 1.5, "x")
    assert bench._read_last_good("m")["value"] == 1.5


def test_set_watchdog_arg():
    f = bench._set_watchdog_arg
    assert f(["--batch", "8"], 300) == ["--batch", "8", "--watchdog", "300"]
    assert f(["--watchdog", "1800"], 300) == ["--watchdog", "300"]
    assert f(["--watchdog=1800", "--iters", "2"], 300) == [
        "--watchdog=300", "--iters", "2"]
    assert f(["-q", "--watchdog", "5", "-x"], 9) == [
        "-q", "--watchdog", "9", "-x"]


class _FakeRun:
    """Scripted subprocess.run stand-in for the supervisor loop."""

    def __init__(self, outcomes):
        self.outcomes = list(outcomes)
        self.calls = []

    def __call__(self, argv, **kw):
        self.calls.append((argv, kw))
        # repeat the last outcome when exhausted (the budget-spent test
        # loops on wall-clock, not on a fixed call count)
        out = (self.outcomes.pop(0) if len(self.outcomes) > 1
               else self.outcomes[0])
        if out == "timeout":
            raise subprocess.TimeoutExpired(argv, kw.get("timeout"))
        code, stdout = out
        return subprocess.CompletedProcess(argv, code, stdout=stdout,
                                           stderr="")


def _supervise_with(monkeypatch, outcomes, budget, argv=None):
    fake = _FakeRun(outcomes)
    monkeypatch.setattr(bench.subprocess, "run", fake)
    monkeypatch.setattr(sys, "argv", ["bench.py"] + (argv or []))
    monkeypatch.setenv("GAN_SEG_BENCH_RETRY_BACKOFF", "0.01")
    ok = bench._supervise("m", "u", time.monotonic() + budget, budget)
    fake.ok = ok
    return fake


def test_supervisor_forwards_success_line(monkeypatch, capsys):
    """A successful inner attempt's JSON line is forwarded verbatim and the
    inner argv got the sliced watchdog + attempt marker."""
    ok = json.dumps({"metric": "m", "value": 123.4, "unit": "u",
                     "vs_baseline": 2.0})
    fake = _supervise_with(monkeypatch, [(0, "# noise\n" + ok + "\n")],
                           budget=1800, argv=["--batch", "4"])
    out = capsys.readouterr().out.strip()
    assert json.loads(out)["value"] == 123.4
    argv, kw = fake.calls[0]
    assert "--watchdog" in argv and "--batch" in argv
    wd = int(argv[argv.index("--watchdog") + 1])
    assert 0 < wd <= 600  # sliced, not the whole 1800s budget
    assert kw["env"]["GAN_SEG_BENCH_ATTEMPT"] == "1"


def test_supervisor_retries_until_success(monkeypatch, capsys):
    """A mid-run wedge (timeout), a zero-value error line, and a crash are
    each retried; the eventual success is the only stdout JSON."""
    err = json.dumps({"metric": "m", "value": 0.0, "unit": "u",
                      "error": "watchdog: no result"})
    ok = json.dumps({"metric": "m", "value": 55.5, "unit": "u",
                     "vs_baseline": None})
    fake = _supervise_with(
        monkeypatch, ["timeout", (0, err + "\n"), (1, ""), (0, ok + "\n")],
        budget=1800)
    assert len(fake.calls) == 4
    lines = capsys.readouterr().out.strip().splitlines()
    assert [json.loads(x)["value"] for x in lines if x.startswith("{")] == \
        [55.5]


def test_supervisor_spent_budget_emits_error(monkeypatch, capsys, tmp_path):
    """When every attempt fails, the terminal error JSON counts attempts,
    quotes the last failure, and carries last-good context."""
    side = str(tmp_path / "lg.json")
    monkeypatch.setattr(bench, "_LAST_GOOD", side)
    bench._write_last_good("m", 440.2, "u")
    err = json.dumps({"metric": "m", "value": 0.0, "unit": "u",
                      "error": "device unresponsive after 3 probe(s)"})
    # budget 92s: one attempt fits (remaining 92 > 90), then remaining
    # drops under the floor and the loop gives up
    fake = _supervise_with(monkeypatch, [(0, err + "\n")], budget=92)
    assert len(fake.calls) >= 1
    assert fake.ok is False  # main() turns this into exit code 3
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0
    assert "measurement attempt(s)" in out["error"]
    assert "device unresponsive" in out["error"]
    assert out["last_good"]["value"] == 440.2


def test_supervisor_success_returns_true(monkeypatch, capsys):
    ok = json.dumps({"metric": "m", "value": 1.0, "unit": "u",
                     "vs_baseline": None})
    fake = _supervise_with(monkeypatch, [(0, ok + "\n")], budget=1800)
    assert fake.ok is True
    capsys.readouterr()


def test_supervisor_small_watchdog_still_attempts(monkeypatch, capsys):
    """A --watchdog at or under the 90s retry floor must still take ONE
    measurement shot (the CPU-backend smoke ran fine at 60s before the
    supervisor existed) instead of insta-failing with zero attempts."""
    ok = json.dumps({"metric": "m", "value": 7.5, "unit": "u",
                     "vs_baseline": None})
    fake = _supervise_with(monkeypatch, [(0, ok + "\n")], budget=60)
    assert len(fake.calls) == 1
    assert fake.ok is True
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 7.5
    # the inner watchdog never goes degenerate, even on a tiny budget
    argv, _ = fake.calls[0]
    assert int(argv[argv.index("--watchdog") + 1]) >= 30


def test_supervisor_bails_on_repeated_crash(monkeypatch, capsys):
    """Two consecutive no-JSON nonzero exits = a deterministic bug (e.g. a
    ValueError from an invalid flag combo): stop immediately and surface
    the stderr tail instead of grinding the whole 30-min budget on
    identical crashes."""
    fake = _FakeRun([(1, "")])
    fake.outcomes = [(1, "")]  # every attempt crashes identically
    monkeypatch.setattr(bench.subprocess, "run", fake)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.setenv("GAN_SEG_BENCH_RETRY_BACKOFF", "0.01")
    t0 = time.monotonic()
    ok = bench._supervise("m", "u", t0 + 1800, 1800)
    assert ok is False
    assert len(fake.calls) == 2  # one retry tolerated, then give up
    assert time.monotonic() - t0 < 60  # did NOT burn the budget
    out = json.loads(capsys.readouterr().out.strip())
    assert "exit code 1" in out["error"]


class _FakeTime:
    """Deterministic clock for the deadline-arithmetic test: ``sleep``
    advances ``monotonic`` instantly, so the straddle scenario runs in
    microseconds of real time."""

    def __init__(self, start=1000.0):
        self.now = start
        self.strftime = time.strftime  # passthrough (sidecar timestamps)

    def monotonic(self):
        return self.now

    def sleep(self, s):
        self.now += s


def test_supervisor_kill_never_crosses_emit_margin(monkeypatch, capsys,
                                                   tmp_path):
    """Round-4 regression (BENCH_r04 rc=124/parsed=null): the last attempt's
    subprocess window used to be sized ``inner_wd + 60`` — up to ~45 s PAST
    the deadline — so the driver's external kill landed while the supervisor
    still owed its terminal JSON. Pin the invariant: with every attempt
    wedging (consuming its whole kill window), no subprocess timeout ever
    extends past ``deadline - _EMIT_MARGIN``, and the error JSON prints
    strictly before the deadline."""
    monkeypatch.setattr(bench, "_LAST_GOOD", str(tmp_path / "lg.json"))
    ft = _FakeTime()
    monkeypatch.setattr(bench, "time", ft)
    calls = []

    def fake_run(argv, **kw):
        calls.append((ft.monotonic(), kw["timeout"]))
        ft.sleep(kw["timeout"])  # the wedge eats the whole window
        raise subprocess.TimeoutExpired(argv, kw["timeout"])

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.setenv("GAN_SEG_BENCH_RETRY_BACKOFF", "60")
    budget = 1650  # the new default, below the driver's 1800 s kill
    deadline = ft.monotonic() + budget
    ok = bench._supervise("m", "u", deadline, budget)
    assert ok is False
    assert len(calls) >= 2  # kept retrying inside the budget
    for t0, timeout in calls:
        assert t0 + timeout <= deadline - bench._EMIT_MARGIN + 1e-6
    # the terminal error line printed BEFORE the deadline (which is itself
    # 150 s inside the driver's 1800 s budget at the default watchdog)
    assert ft.monotonic() < deadline
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0
    assert "measurement attempt(s)" in out["error"]


def test_default_watchdog_below_driver_budget(monkeypatch):
    """The default --watchdog must sit BELOW the driver's 1800 s kill (the
    round-4 default of exactly 1800 left zero emit margin), and stay
    env-overridable."""
    monkeypatch.delenv("GAN_SEG_BENCH_WATCHDOG", raising=False)
    assert bench._default_watchdog() == 1650
    assert bench._default_watchdog() + bench._EMIT_MARGIN < 1800
    monkeypatch.setenv("GAN_SEG_BENCH_WATCHDOG", "900")
    assert bench._default_watchdog() == 900


def test_median_and_captures_protocol():
    """One shared implementation of the --repeat reporting protocol
    (bench.py + the two standalone bench tools import it)."""
    v, cap = bench.median_and_captures([5.0])
    assert v == 5.0 and cap is None
    v, cap = bench.median_and_captures([3.0, 1.0, 2.0])
    assert v == 2.0
    assert cap == {"repeat": 3, "min": 1.0, "max": 3.0,
                   "all": [1.0, 2.0, 3.0]}
    # even N: upper median, matching the documented protocol
    v, _ = bench.median_and_captures([4.0, 1.0])
    assert v == 4.0


def test_probe_pins_requested_platform():
    """The preflight probe must target the backend the measurement will
    use: with JAX_PLATFORMS=cpu the probe succeeds even when the axon
    tunnel is wedged (the sitecustomize force-registers the TPU over the
    env var, so the probe replicates main()'s config-API override)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", bench._PROBE], env=env,
                       timeout=120, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.slow
def test_bench_cli_repeat_on_cpu(tmp_path):
    """Full CLI path at tiny res on the CPU backend: --repeat 2 emits the
    median plus a captures block, and the success path writes the
    last-good sidecar."""
    side = str(tmp_path / "last_good.json")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GAN_SEG_BENCH_LAST_GOOD"] = side
    r = subprocess.run(
        [sys.executable, join(ROOT, "bench.py"), "--max-res-log2", "5",
         "--batch", "2", "--iters", "2", "--repeat", "2",
         "--watchdog", "1400"],
        env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["metric"] == "z_to_image_mask_samples_per_sec_32px"
    assert out["value"] > 0
    cap = out["captures"]
    assert cap["repeat"] == 2 and len(cap["all"]) == 2
    assert cap["min"] <= out["value"] <= cap["max"]
    assert isfile(side)
    with open(side) as fp:
        lg = json.load(fp)[out["metric"]]
    assert lg["value"] == out["value"]


def test_supervisor_small_watchdog_child_outlives_inner_watchdog(monkeypatch):
    """Small-but-valid budgets (e.g. --watchdog 50 on the CPU backend) must
    still give the child a kill window LONGER than its own inner watchdog:
    at the 30s inner floor the old cap `remaining - margin` could clamp the
    kill below it, SIGKILLing the child mid-measurement and losing its
    error JSON (round-5 review). The kill may eat into the supervisor's
    emit margin — the terminal print needs milliseconds."""
    ok = '{"metric": "m", "value": 1.0, "unit": "u"}'
    fake = _supervise_with(monkeypatch, [(0, ok + "\n")], budget=50)
    assert fake.ok
    (argv, kw), = fake.calls
    inner_wd = int(argv[argv.index("--watchdog") + 1])
    assert inner_wd == 30  # the floor
    assert kw["timeout"] >= inner_wd + 5

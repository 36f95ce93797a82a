"""Elastic supervisor: restart-on-failure with backoff + resume contract."""

from fiber_tpu.train.supervisor import supervise


def test_restarts_until_success():
    codes = iter([1, 139, 0])
    sleeps = []
    res = supervise(["train"], max_restarts=5, backoff_s=1.0,
                    run=lambda c: next(codes), sleep=sleeps.append,
                    log=lambda m: None)
    assert res.returncode == 0
    assert res.attempts == 3
    assert res.history == [1, 139, 0]
    assert sleeps == [1.0, 2.0]  # exponential backoff


def test_gives_up_after_max_restarts():
    res = supervise(["train"], max_restarts=2, backoff_s=0.0,
                    run=lambda c: 1, sleep=lambda s: None,
                    log=lambda m: None)
    assert res.returncode == 1
    assert res.attempts == 3  # initial + 2 restarts


def test_real_subprocess_roundtrip(tmp_path):
    """First invocation fails, second succeeds (stateful marker file) —
    models crash -> restart -> checkpoint-resume."""
    marker = tmp_path / "ran_once"
    script = (f"import os,sys; p=r'{marker}'; "
              "sys.exit(0) if os.path.exists(p) else "
              "(open(p,'w').close(), sys.exit(3))")
    import sys
    res = supervise([sys.executable, "-c", script], max_restarts=3,
                    backoff_s=0.0, sleep=lambda s: None,
                    log=lambda m: None)
    assert res.returncode == 0
    assert res.history == [3, 0]


def test_cli_strips_only_leading_separator(tmp_path):
    """A literal '--' inside the wrapped command must pass through."""
    import sys
    from fiber_tpu.train import supervisor

    out = tmp_path / "argv.txt"
    script = f"import sys; open(r'{out}','w').write(' '.join(sys.argv[1:]))"
    rc = supervisor.main(["--max-restarts", "0", "--backoff", "0",
                          "--", sys.executable, "-c", script,
                          "--", "--flag"])
    assert rc == 0
    assert out.read_text() == "-- --flag"

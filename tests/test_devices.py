"""Device-acquisition watchdog (gea/utils/devices.py — VERDICT r3 weak
#6: the tunnel-wedge guard was a bench.py-only feature; every CLI's
first device touch now goes through the shared acquire_devices)."""

import os
import subprocess
import sys
import threading
import time

import pytest

from gea.utils import devices as dev


def test_watch_ok_path():
    status, result = dev._watch(lambda: [1, 2, 3], timeout=5.0)
    assert status == "ok"
    assert result == [1, 2, 3]


def test_watch_error_path():
    def boom():
        raise RuntimeError("init failed")

    status, err = dev._watch(boom, timeout=5.0)
    assert status == "error"
    assert isinstance(err, RuntimeError)


def test_watch_hang_path():
    release = threading.Event()

    def wedged():
        release.wait(30)

    t0 = time.monotonic()
    status, result = dev._watch(wedged, timeout=0.2)
    assert status == "hung"
    assert result is None
    assert time.monotonic() - t0 < 5.0
    release.set()


def test_acquire_devices_error_reraises(monkeypatch):
    monkeypatch.setattr(dev, "_acquired", False)

    def boom():
        raise RuntimeError("no backend")

    with pytest.raises(RuntimeError, match="no backend"):
        dev.acquire_devices(probe=boom, timeout=5.0)


def test_acquire_devices_caches_after_success(monkeypatch):
    monkeypatch.setattr(dev, "_acquired", False)
    calls = []

    def probe():
        calls.append(1)
        return ["d0"]

    assert dev.acquire_devices(probe=probe, timeout=5.0) == ["d0"]
    assert dev._acquired
    # Second call probes inline (no watcher thread) but still returns.
    assert dev.acquire_devices(probe=probe, timeout=5.0) == ["d0"]
    assert len(calls) == 2


def test_acquire_devices_hang_exits_process_with_diagnostic(tmp_path):
    """A wedged first device touch must produce a clear timeout error
    (exit code 17 + the wedged-relay message) instead of an indefinite
    hang — exercised in a subprocess because the hang path os._exit()s
    (the hung init thread cannot be unwound in-process)."""
    script = tmp_path / "hang.py"
    script.write_text(
        "import threading\n"
        "from gea.utils.devices import acquire_devices\n"
        "acquire_devices(\n"
        "    what='test device acquisition',\n"
        "    timeout=1.0,\n"
        "    probe=lambda: threading.Event().wait(60),\n"
        ")\n"
        "print('UNREACHABLE')\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ, PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    )
    proc = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True,
        text=True,
        timeout=60,
        env=env,
        cwd=repo,
    )
    assert proc.returncode == 17
    assert "wedged" in proc.stderr
    assert "GEA_DEVICE_TIMEOUT" in proc.stderr
    assert "UNREACHABLE" not in proc.stdout

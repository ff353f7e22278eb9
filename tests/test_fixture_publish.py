"""_publish_fixture_dir: atomic fixture publication under crashes and
races (lockfile-serialized — see the function doc)."""

import os
import time

from logpipe_ray.pipelines.queries import _publish_fixture_dir


def _build(tmp_path, name):
    tmp = str(tmp_path / f"{name}.build-x")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    return tmp


def test_publish_plain(tmp_path):
    d = str(tmp_path / "fix")
    _publish_fixture_dir(_build(tmp_path, "fix"), d)
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    assert not os.path.exists(d + ".lock")


def test_publish_discards_loser_and_keeps_winner(tmp_path):
    d = str(tmp_path / "fix")
    winner = _build(tmp_path, "fix")
    with open(os.path.join(winner, "who"), "w") as f:
        f.write("winner")
    _publish_fixture_dir(winner, d)
    loser = str(tmp_path / "fix.build-y")
    os.makedirs(loser)
    with open(os.path.join(loser, "_SUCCESS"), "w") as f:
        f.write("ok")
    with open(os.path.join(loser, "who"), "w") as f:
        f.write("loser")
    _publish_fixture_dir(loser, d)  # must keep the published winner
    assert open(os.path.join(d, "who")).read() == "winner"
    assert not os.path.exists(loser)


def test_publish_replaces_markerless_stale_dir(tmp_path):
    d = str(tmp_path / "fix")
    os.makedirs(d)  # torn dir from a pre-publish crash: no _SUCCESS
    with open(os.path.join(d, "partial.csv"), "w") as f:
        f.write("x")
    _publish_fixture_dir(_build(tmp_path, "fix"), d)
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    assert not os.path.exists(os.path.join(d, "partial.csv"))


def test_publish_breaks_stale_lock_by_wall_clock(tmp_path):
    """A crashed builder's lock (old mtime) must be broken promptly —
    regression test for the monotonic-vs-epoch clock mix-up that made
    this path dead and every waiter run out the 120 s deadline."""
    d = str(tmp_path / "fix")
    lock = d + ".lock"
    open(lock, "w").close()
    os.utime(lock, (time.time() - 120, time.time() - 120))
    t0 = time.time()
    _publish_fixture_dir(_build(tmp_path, "fix"), d)
    assert time.time() - t0 < 5  # broke the lock, didn't wait out 120s
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    assert not os.path.exists(lock)


def test_publish_waits_for_live_lock_holder(tmp_path):
    """A FRESH lock (live builder) is honored: the waiter returns as
    soon as the holder's marker appears, discarding its own build."""
    import threading

    d = str(tmp_path / "fix")
    lock = d + ".lock"
    open(lock, "w").close()  # fresh mtime — a live builder

    def holder():
        time.sleep(0.3)
        winner = _build(tmp_path, "fixw")
        os.rename(winner, d)  # holder publishes...
        os.remove(lock)  # ...and releases

    t = threading.Thread(target=holder)
    t.start()
    loser = _build(tmp_path, "fix")
    _publish_fixture_dir(loser, d)
    t.join()
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    assert not os.path.exists(loser)  # waiter discarded its build

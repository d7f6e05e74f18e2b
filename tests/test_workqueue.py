"""Work-queue failure detection / retry / resume semantics."""

import pytest

from vit_deep_radiomics_tpu.engine.workqueue import WorkQueue


class TestWorkQueue:
    def test_done_items_skipped_on_rerun(self, tmp_path):
        calls = []
        q = WorkQueue(tmp_path / "q.json")
        stats = q.run(["a", "b"], calls.append, log=lambda *_: None)
        assert stats == {"done": 2, "skipped": 0, "failed": 0}
        q2 = WorkQueue(tmp_path / "q.json")
        stats = q2.run(["a", "b", "c"], calls.append, log=lambda *_: None)
        assert stats == {"done": 1, "skipped": 2, "failed": 0}
        assert calls == ["a", "b", "c"]

    def test_failure_recorded_and_retried(self, tmp_path):
        attempts = {"x": 0}

        def flaky(key):
            attempts[key] += 1
            if attempts[key] < 2:
                raise RuntimeError("transient")

        q = WorkQueue(tmp_path / "q.json", max_retries=2)
        stats = q.run(["x"], flaky, log=lambda *_: None)
        assert stats["failed"] == 1
        assert "transient" in q.failed["x"]["error"]
        # second run retries and succeeds
        q2 = WorkQueue(tmp_path / "q.json", max_retries=2)
        stats = q2.run(["x"], flaky, log=lambda *_: None)
        assert stats["done"] == 1
        assert "x" not in q2.failed

    def test_max_retries_exhausted(self, tmp_path):
        def broken(key):
            raise ValueError("permanent")

        for _ in range(3):
            q = WorkQueue(tmp_path / "q.json", max_retries=2)
            q.run(["y"], broken, log=lambda *_: None)
        q = WorkQueue(tmp_path / "q.json", max_retries=2)
        stats = q.run(["y"], broken, log=lambda *_: None)
        assert stats == {"done": 0, "skipped": 0, "failed": 1}
        assert q.failed["y"]["retries"] == 2

    def test_keyboard_interrupt_propagates(self, tmp_path):
        def interrupted(key):
            raise KeyboardInterrupt

        q = WorkQueue(tmp_path / "q.json")
        with pytest.raises(KeyboardInterrupt):
            q.run(["z"], interrupted, log=lambda *_: None)


class TestDeferredFinalize:
    def test_finalizers_run_and_items_marked_done(self, tmp_path):
        order = []

        def worker(key):
            order.append(f"compute:{key}")
            return lambda: order.append(f"write:{key}")

        q = WorkQueue(tmp_path / "q.json")
        stats = q.run(["a", "b"], worker, log=lambda *_: None)
        assert stats == {"done": 2, "skipped": 0, "failed": 0}
        assert set(q.done) == {"a", "b"}
        # every finalizer ran; a's write overlaps b's compute so it joins
        # only after b's compute starts
        assert sorted(order) == sorted(
            ["compute:a", "compute:b", "write:a", "write:b"]
        )
        assert order.index("write:a") > order.index("compute:b") - 2

    def test_finalizer_failure_recorded_against_own_key(self, tmp_path):
        def worker(key):
            if key == "bad":
                return lambda: (_ for _ in ()).throw(IOError("disk full"))
            return lambda: None

        q = WorkQueue(tmp_path / "q.json", max_retries=2)
        stats = q.run(["bad", "good"], worker, log=lambda *_: None)
        assert stats["done"] == 1
        assert stats["failed"] == 1
        assert "bad" in q.failed and "disk full" in q.failed["bad"]["error"]
        assert "good" in q.done and "bad" not in q.done

    def test_finalizer_failure_retried_on_rerun(self, tmp_path):
        attempts = {"k": 0}

        def worker(key):
            def finalize():
                attempts[key] += 1
                if attempts[key] < 2:
                    raise RuntimeError("transient write error")
            return finalize

        q = WorkQueue(tmp_path / "q.json", max_retries=2)
        assert q.run(["k"], worker, log=lambda *_: None)["failed"] == 1
        q2 = WorkQueue(tmp_path / "q.json", max_retries=2)
        assert q2.run(["k"], worker, log=lambda *_: None)["done"] == 1

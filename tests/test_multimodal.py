"""Multimodal payload plumbing: decode/resize/frame-sample stubs.

The decode kernels are honest stubs (no codecs in this container), but
the Ray-side plumbing — schemas, actor signatures, zero-copy slicing —
is real and verified here byte-for-byte."""

import pyarrow as pa
import pytest


def _payload_batch(payloads):
    return pa.table(
        {
            "doc_id": pa.array(list(range(len(payloads))), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


class TestFrameSample:
    def test_frames_reconstruct_payload(self):
        from logpipe_ray.stages.multimodal import FrameSampleStub

        payloads = [b"a" * 10, b"", b"xyz", bytes(range(97)) * 3, b"q" * 96]
        out = FrameSampleStub(frame_stride=7)(_payload_batch(payloads))
        out["frame"].combine_chunks().validate(full=True)
        rebuilt = {}
        for d, f in zip(out["doc_id"].to_pylist(), out["frame"].to_pylist()):
            rebuilt[d] = rebuilt.get(d, b"") + f
        for i, p in enumerate(payloads):
            assert rebuilt.get(i, b"") == p

    def test_frame_lengths_and_indices(self):
        from logpipe_ray.stages.multimodal import FrameSampleStub

        out = FrameSampleStub(frame_stride=4)(_payload_batch([b"abcdefghij"]))
        assert out["frame_idx"].to_pylist() == [0, 1, 2]
        assert out["frame_bytes"].to_pylist() == [4, 4, 2]

    def test_sliced_batch(self):
        from logpipe_ray.stages.multimodal import FrameSampleStub

        b = _payload_batch([b"skipme", b"abcdefgh"])
        out = FrameSampleStub(frame_stride=5)(b.slice(1))
        assert out["frame"].to_pylist() == [b"abcde", b"fgh"]

    def test_real_mode_raises(self):
        from logpipe_ray.stages.multimodal import FrameSampleStub

        with pytest.raises(NotImplementedError):
            FrameSampleStub(real=True)


class TestResize:
    def test_truncation_semantics(self):
        from logpipe_ray.stages.multimodal import ResizeStub

        big = b"z" * (224 * 224 + 5)
        out = ResizeStub()(_payload_batch([b"small", big]))
        assert out["resized_bytes"].to_pylist() == [5, 224 * 224]
        assert out["payload_bytes"].to_pylist() == [5, len(big)]
        assert out["out_w"].to_pylist() == [224, 224]

    def test_real_mode_raises(self):
        from logpipe_ray.stages.multimodal import ResizeStub

        with pytest.raises(NotImplementedError):
            ResizeStub(real=True)

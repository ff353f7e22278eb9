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


class TestWavReal:
    def test_wav_bytes_stdlib_readable(self):
        """The synthesized payloads are REAL WAV files: the stdlib
        ``wave`` module reads them back with matching params and
        byte-exact PCM frames matching the synth formula."""
        import io
        import wave

        import numpy as np
        import pyarrow as pa

        from logpipe_ray.stages.multimodal import encode_wav_payload

        tbl = pa.table(
            {
                "doc_id": pa.array([7, 1234], type=pa.int64()),
                "text": pa.array(["hello world", "x" * 100]),
            }
        )
        out = encode_wav_payload(tbl)
        for row in range(2):
            did = tbl["doc_id"][row].as_py()
            nb = len(tbl["text"][row].as_py().encode())
            payload = out["payload"][row].as_py()
            with wave.open(io.BytesIO(payload)) as w:
                assert w.getnchannels() == 1
                assert w.getsampwidth() == 2
                assert w.getframerate() == 16000
                n = w.getnframes()
                assert n == 1 + nb % 2048
                got = np.frombuffer(w.readframes(n), dtype="<i2")
            exp = ((did * 1000003 + np.arange(n) * 10007) % 65536 - 32768).astype(
                "<i2"
            )
            assert np.array_equal(got, exp)

    def test_wav_decode_features(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from logpipe_ray.stages.multimodal import WavDecode, encode_wav_payload

        tbl = pa.table(
            {
                "doc_id": pa.array(list(range(20)), type=pa.int64()),
                "text": pa.array([f"doc {i} " + "y" * (i * 13) for i in range(20)]),
            }
        )
        out = (
            ray.data.from_arrow(tbl)
            .repartition(3)
            .map_batches(encode_wav_payload, batch_format="pyarrow")
            .map_batches(WavDecode, batch_format="pyarrow", concurrency=1, num_cpus=0.5)
            .to_pandas()
            .set_index("doc_id")
        )
        for i in range(20):
            nb = len(f"doc {i} ".encode()) + i * 13
            n = 1 + nb % 2048
            smp = (i * 1000003 + np.arange(n) * 10007) % 65536 - 32768
            r = out.loc[i]
            assert r["n_samples"] == n
            assert r["sum_abs"] == np.abs(smp).sum()
            neg = smp < 0
            assert r["zero_crossings"] == int((neg[1:] != neg[:-1]).sum())

    def test_wav_decode_rejects_non_wav(self):
        import pyarrow as pa
        import pytest

        from logpipe_ray.stages.multimodal import WavDecode

        b = pa.table({"payload": pa.array([b"not a wav" * 10], type=pa.binary())})
        with pytest.raises(ValueError, match="WAV"):
            WavDecode()(b)

    def test_wav_trailing_zero_sample_doc(self):
        """A valid ZERO-sample WAV at the end of a batch must not
        corrupt the preceding doc's features (regression: a reduceat
        boundary clamp dropped the previous doc's last sample)."""
        import struct

        import numpy as np
        import pyarrow as pa

        from logpipe_ray.stages.multimodal import WavDecode, encode_wav_payload

        tbl = pa.table(
            {"doc_id": pa.array([7], type=pa.int64()), "text": pa.array(["ab"])}
        )
        [real] = encode_wav_payload(tbl)["payload"].to_pylist()

        def empty_wav():
            h = b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
            h += struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
            return h + b"data" + struct.pack("<I", 0)

        for payloads in ([real, empty_wav()], [empty_wav(), real]):
            b = pa.table({"payload": pa.array(payloads, type=pa.binary())})
            out = WavDecode()(b).to_pydict()
            i = payloads.index(real)
            n = out["n_samples"][i]
            smp = (7 * 1000003 + np.arange(n) * 10007) % 65536 - 32768
            assert out["sum_abs"][i] == np.abs(smp).sum()
            neg = smp < 0
            assert out["zero_crossings"][i] == int((neg[1:] != neg[:-1]).sum())
            j = 1 - i
            assert out["n_samples"][j] == 0
            assert out["sum_abs"][j] == 0 and out["zero_crossings"][j] == 0

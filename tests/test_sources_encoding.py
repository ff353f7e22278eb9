"""Text source (glob screens, line counters), encoding stage, path template."""

import datetime
import os
import tempfile

import pyarrow as pa

from logpipe_ray.sources.text import match_files, read_log_lines, split_file_to_lines
from logpipe_ray.stages.encoding import decode_binary, encode_string
from logpipe_ray.util import expand_path_template


class TestGlobScreens:
    def test_include_exclude_and_prefix_skip(self):
        names = ["a.log", "b.log", "b.tmp", ".hidden.log", "_part.log", "c.LOG"]
        assert match_files(names, include=["*.log"]) == ["a.log", "b.log"]
        assert match_files(names, include=["*.log"], exclude=["b*"]) == ["a.log"]
        assert match_files(names) == ["a.log", "b.log", "b.tmp", "c.LOG"]


class TestLineSplit:
    def test_counters_exact(self):
        payload = "first\nsecond line\nthird\n".encode()
        t = pa.table({"path": ["/x/app.log"], "bytes": [payload]})
        out = split_file_to_lines(t)
        assert out["source"].to_pylist() == ["app.log"] * 3
        assert out["line_no"].to_pylist() == [1, 2, 3]
        assert out["byte_offset"].to_pylist() == [0, 6, 18]
        assert out["line"].to_pylist() == ["first", "second line", "third"]

    def test_no_trailing_newline(self):
        t = pa.table({"path": ["/x/a.log"], "bytes": ["one\ntwo".encode()]})
        out = split_file_to_lines(t)
        assert out["line"].to_pylist() == ["one", "two"]

    def test_end_to_end_read(self):
        d = tempfile.mkdtemp(prefix="lpr_txt_")
        with open(os.path.join(d, "x.log"), "w") as f:
            f.write("l1\nl2\n")
        with open(os.path.join(d, "_skip.log"), "w") as f:
            f.write("nope\n")
        ds = read_log_lines(d, include=["*.log"])
        rows = sorted(
            (r["source"], r["line_no"], r["line"]) for r in ds.take_all()
        )
        assert rows == [("x.log", 1, "l1"), ("x.log", 2, "l2")]

    def test_file_larger_than_chunk(self):
        """Cross-chunk line reassembly: a file much bigger than the read
        chunk, with variable-length lines (some longer than a chunk) and
        no trailing newline — counters and contents must be identical to
        the whole-file split."""
        d = tempfile.mkdtemp(prefix="lpr_txtbig_")
        import random

        rnd = random.Random(7)
        lines = []
        for i in range(500):
            n = rnd.choice([3, 40, 90, 700])  # some lines > chunk_bytes
            lines.append(f"line{i:04d}:" + "x" * n)
        body = "\n".join(lines)  # no trailing newline
        with open(os.path.join(d, "big.log"), "w") as f:
            f.write(body)
        with open(os.path.join(d, "small.log"), "w") as f:
            f.write("a\nb\n")

        ds = read_log_lines(d, include=["*.log"], chunk_bytes=256)
        got = sorted(
            (r["source"], r["line_no"], r["byte_offset"], r["line"])
            for r in ds.take_all()
        )
        # expected from the whole-file splitter
        t = pa.table(
            {"path": [os.path.join(d, "big.log")], "bytes": [body.encode()]}
        )
        exp_big = split_file_to_lines(t)
        expect = sorted(
            [
                ("big.log", ln, off, line)
                for ln, off, line in zip(
                    exp_big["line_no"].to_pylist(),
                    exp_big["byte_offset"].to_pylist(),
                    exp_big["line"].to_pylist(),
                )
            ]
            + [("small.log", 1, 0, "a"), ("small.log", 2, 2, "b")]
        )
        assert got == expect


class TestDirectoryTail:
    def test_incremental_consume_and_rotation(self):
        from logpipe_ray.sources.stream import DirectoryTailSource

        d = tempfile.mkdtemp(prefix="lpr_tailsrc_")
        state = os.path.join(d, "_state")
        with open(os.path.join(d, "a.log"), "w") as f:
            f.write("a1\na2\npartial")  # unterminated tail line
        src = DirectoryTailSource(d, state, include=["*.log"])

        got1 = sorted(
            (r["source"], r["line_no"], r["byte_offset"], r["line"])
            for r in src.read().take_all()
        )
        assert got1 == [("a.log", 1, 0, "a1"), ("a.log", 2, 3, "a2")]
        src.commit()

        # nothing new → empty increment
        assert src.read().take_all() == []

        # finish the partial line, append one more, add a new file
        with open(os.path.join(d, "a.log"), "a") as f:
            f.write("-done\na4\n")
        with open(os.path.join(d, "b.log"), "w") as f:
            f.write("b1\n")
        got2 = sorted(
            (r["source"], r["line_no"], r["byte_offset"], r["line"])
            for r in src.read().take_all()
        )
        assert got2 == [
            ("a.log", 3, 6, "partial-done"),
            ("a.log", 4, 19, "a4"),
            ("b.log", 1, 0, "b1"),
        ]
        src.commit()

        # rotation: file shrinks below the committed offset → re-baseline
        with open(os.path.join(d, "a.log"), "w") as f:
            f.write("r1\n")
        got3 = [
            (r["source"], r["line_no"], r["line"]) for r in src.read().take_all()
        ]
        assert got3 == [("a.log", 1, "r1")]

        # uncommitted read is repeatable (at-least-once before commit)
        got3b = [
            (r["source"], r["line_no"], r["line"]) for r in src.read().take_all()
        ]
        assert got3b == got3


class TestEncoding:
    def test_gb18030_roundtrip(self):
        texts = ["简单的中文日志行", "ascii only", "mixed 日志 text"]
        t = pa.table({"text": texts})
        enc = encode_string(t, col="text", encoding="gb18030", out_col="raw")
        # raw is NOT valid utf-8 for the CJK rows — the iconv scenario
        assert enc["raw"][0].as_py() != texts[0].encode()
        dec = decode_binary(enc, col="raw", encoding="gb18030", out_col="back")
        assert dec["back"].to_pylist() == texts

    def test_null_passthrough(self):
        t = pa.table({"text": pa.array(["a", None], type=pa.string())})
        enc = encode_string(t, col="text", out_col="raw")
        dec = decode_binary(enc, col="raw", out_col="back")
        assert dec["back"].to_pylist() == ["a", None]


class TestPathTemplate:
    def test_reference_letter_scheme(self):
        when = datetime.datetime(2026, 8, 17, 3, 7, 9)
        out = expand_path_template("out/%Y%M%D/%h-%m-%s/part", when)
        assert out == "out/20260817/03-07-09/part"


class TestDatedDirSink:
    def test_dated_dir_routed_write_roundtrip(self, sf_dir, tmp_path):
        """output-hdfs dated-directory semantics
        (logpipe-output-hdfs.sh analog): the sink path template expands
        at write time, the routed write lands under the dated dir, and
        reading the directory back yields every routed row."""
        from datetime import datetime

        from logpipe_ray.pipelines.flagship import read_routed, run_flagship
        from logpipe_ray.util import expand_path_template

        when = datetime(2026, 8, 17, 12, 0, 0)
        out = expand_path_template(str(tmp_path / "logs" / "%Y%M%D"), when)
        assert out.endswith("20260817")
        counters = run_flagship(sf_dir, out).to_pandas()
        ds = read_routed(out)
        assert ds.count() == int(counters["n_rows"].sum())
        # the hive sink= partition is re-derived from the dated path
        assert set(ds.schema().names) >= {"doc_id", "source", "sink"}

"""Unit tests for vectorized parse stages (tiny in-memory Arrow tables)."""

import pyarrow as pa
import pytest

from logpipe_ray.stages.parse import (
    cut_route_key,
    format_template,
    grep_filter,
    pack_metadata,
    split_fields,
    unpack_metadata,
)


def _t(**cols):
    return pa.table(cols)


class TestCutRouteKey:
    def test_basic_cut(self):
        t = _t(source=["app_web_00.log", "db_core_01.log", "sys_monitor_14.log"])
        out = cut_route_key(t)
        assert out["route_key"].to_pylist() == ["app_web", "db_core", "sys_monitor"]

    def test_one_word(self):
        t = _t(source=["app_web_00.log"])
        out = cut_route_key(t, n_words=1)
        assert out["route_key"].to_pylist() == ["app"]

    def test_no_extension(self):
        # reference cut logic strips ext then takes words
        # (logpipe-output-ingeek.c:468-493): a_b_c.log -> a_b
        t = _t(source=["a_b_c.log", "a_b_c", "single.log", "single"])
        out = cut_route_key(t, n_words=2)
        assert out["route_key"].to_pylist() == ["a_b", "a_b", "single", "single"]


class TestPackUnpack:
    def test_round_trip(self):
        t = _t(
            source=["app_web_00.log", "x.log"],
            system=["app_web", "unknown"],
            server=["srv-0", "unknown"],
            offset=[1200, 0],
            line=[12, 0],
        )
        packed = pack_metadata(t, offset_col="offset", line_col="line")
        s = packed["packed"].to_pylist()
        assert s[0] == (
            "[[system=app_web][server=srv-0][filename=app_web_00.log]"
            "[offset=1200][line=12]]"
        )
        out = unpack_metadata(packed)
        assert out["meta_system"].to_pylist() == ["app_web", "unknown"]
        assert out["meta_server"].to_pylist() == ["srv-0", "unknown"]
        assert out["meta_filename"].to_pylist() == ["app_web_00.log", "x.log"]
        assert out["meta_offset"].to_pylist() == [1200, 0]
        assert out["meta_line"].to_pylist() == [12, 0]

    def test_pack_without_counters(self):
        t = _t(source=["f.log"], system=["s"], server=["v"])
        packed = pack_metadata(t)
        assert packed["packed"].to_pylist() == ["[[system=s][server=v][filename=f.log]]"]
        out = unpack_metadata(packed)
        assert out["meta_offset"].to_pylist() == [None]

    def test_unpack_nonmatching_row(self):
        t = _t(packed=["garbage"])
        out = unpack_metadata(t)
        assert out["meta_system"].to_pylist() == [None]

    def test_unpack_config_override(self):
        """Reference rule: configured system/server tags REPLACE the
        parsed header values (logpipe-filter-unpack-metadata.c:57-96)."""
        t = _t(
            packed=[
                "[[system=a][server=s1][filename=f.log][offset=1][line=2]]",
                "[[system=b][server=s2][filename=g.log][offset=3][line=4]]",
            ]
        )
        out = unpack_metadata(t, override_system="SYS", override_server="SRV")
        assert out["meta_system"].to_pylist() == ["SYS", "SYS"]
        assert out["meta_server"].to_pylist() == ["SRV", "SRV"]
        assert out["meta_filename"].to_pylist() == ["f.log", "g.log"]
        assert out["meta_offset"].to_pylist() == [1, 3]


class TestSplitFields:
    LINES = [
        "2024-01-01 10:00:00.123 | api.c:10 | 7 | hello world",
        "2024-01-01 10:00:01.456 | db.c:20 | 8 | second line",
        "malformed",
    ]

    def test_strict_drops_short_rows(self):
        # the reference's fields_strictly arity check drops malformed
        # lines (logpipe-output-es.c:664-668)
        t = _t(line=self.LINES)
        out = split_fields(
            t, text_col="line", max_fields=5, translate=("|", " "), strict=True
        )
        assert out.num_rows == 2
        assert out["f1"].to_pylist() == ["2024-01-01", "2024-01-01"]
        assert out["f3"].to_pylist() == ["api.c:10", "db.c:20"]

    def test_lenient_pads_with_null(self):
        t = _t(line=self.LINES)
        out = split_fields(t, text_col="line", max_fields=5, translate=("|", " "))
        assert out.num_rows == 3
        assert out["f2"].to_pylist()[2] is None
        assert out["f1"].to_pylist()[2] == "malformed"

    def test_template(self):
        t = _t(line=self.LINES[:2])
        out = split_fields(t, text_col="line", max_fields=5, translate=("|", " "))
        out = format_template(out, '{"ts":"$1 $2","src":"$3","seq":$4}')
        assert out["doc"].to_pylist()[0] == (
            '{"ts":"2024-01-01 10:00:00.123","src":"api.c:10","seq":7}'
        )


class TestGrep:
    def test_substring(self):
        t = _t(x=["foo bar", "baz", "embargo"])
        assert grep_filter(t, text_col="x", pattern="bar")["x"].to_pylist() == [
            "foo bar",
            "embargo",
        ]

    def test_invert(self):
        t = _t(x=["foo bar", "baz"])
        assert grep_filter(t, text_col="x", pattern="bar", invert=True)[
            "x"
        ].to_pylist() == ["baz"]

    def test_regex(self):
        t = _t(x=["err42", "ok", "err7"])
        assert grep_filter(t, text_col="x", pattern=r"err\d+", regex=True)[
            "x"
        ].to_pylist() == ["err42", "err7"]

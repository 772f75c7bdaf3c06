"""Unit tests for the wiki-markup parsers (functions/wikitext.py) — the
non-query-visible edges: alias folds, exclusions, nesting, comment and
malformed-segment policies, untimed/sep/dup-lang lyrics semantics."""

from __future__ import annotations

from tlmc_etl_spark.functions.wikitext import (
    bracket_split,
    normalize_track_index,
    parse_lyrics_page,
    strict_split,
    template_refs,
)


class TestStrictSplit:
    def test_splits_only_at_depth_zero(self):
        assert strict_split("a,{b,c},d") == ["a", "{b,c}", "d"]
        assert strict_split("{{x|1|a,b}},y") == ["{{x|1|a,b}}", "y"]

    def test_nested_and_mixed_brackets(self):
        assert strict_split("(a,[b,{c,d}]),e") == ["(a,[b,{c,d}])", "e"]

    def test_unbalanced_closer_tolerated(self):
        assert strict_split("a),b") == ["a)", "b"]


class TestBracketSplit:
    def test_adjacent_templates_split(self):
        assert bracket_split("{{a|1|x}}{{b|2|y}}") == ["{{a|1|x}}", "{{b|2|y}}"]

    def test_comment_yields_nothing(self):
        assert bracket_split("<!-- hidden -->") == []

    def test_stray_char_invalidates(self):
        assert bracket_split("{{a|1|x}}junk") is None

    def test_whitespace_outside_brackets_ok(self):
        assert bracket_split("  {{a|1|x}}  {{b|2|y}} ") == ["{{a|1|x}}", "{{b|2|y}}"]


class TestTemplateRefs:
    def test_basic_extraction(self):
        assert template_refs("{{red-theme|3|05}}") == [("red-theme", 3, "05")]

    def test_alias_fold_and_exclusion(self):
        refs = template_refs(
            "{{old-name|1|A}},{{banned|2|B}}",
            aliases={"old-name": "new-name"},
            exclusions={"banned"},
        )
        assert refs == [("new-name", 1, "A")]

    def test_malformed_part_drops_only_itself(self):
        assert template_refs("{{a|1|x}},oops{bad") == [("a", 1, "x")]

    def test_pipe_stripped_index_and_non_template_skipped(self):
        assert template_refs("{{a|1|x|}},[not a template]") == [("a", 1, "x")]

    def test_original_section_marker_skipped(self):
        assert template_refs("{{a|1|原曲段落}}") == []

    def test_index_normalization_trims_leading_zeros_only(self):
        assert normalize_track_index("007") == "7"
        assert normalize_track_index("000") == ""
        assert normalize_track_index("A01") == "A01"


class TestLyricsParser:
    def test_timestamped_and_dup_lang(self):
        rows = parse_lyrics_page(
            "lyrics=\ntime=00:01.00\nja=one\nen=first\ntime=00:02.00\nja=two\nja=more\n=="
        )
        assert (None, 0, "00:01.00", "ja", "one") in rows
        assert (None, 0, "00:01.00", "en", "first") in rows
        assert (None, 1, "00:02.00", "ja", "two\nmore") in rows

    def test_untimed_lines_group_by_language_repeat(self):
        rows = parse_lyrics_page("lyrics=\nja=a1\nen=b1\nja=a2\nen=b2\n==")
        assert (None, 0, "<line-0>", "ja", "a1") in rows
        assert (None, 0, "<line-0>", "en", "b1") in rows
        assert (None, 1, "<line-1>", "ja", "a2") in rows
        assert (None, 1, "<line-1>", "en", "b2") in rows

    def test_sep_resets_and_consumes_slot(self):
        rows = parse_lyrics_page("lyrics=\ntime=00:01.00\nja=x\nsep=02:00.00\nja=y\n==")
        assert (None, 0, "00:01.00", "ja", "x") in rows
        # sep slot (index 1) emits nothing; the untimed line lands at 2
        assert (None, 2, "<line-0>", "ja", "y") in rows
        assert not any(r[1] == 1 for r in rows)

    def test_implicit_open_on_time_without_lyrics_marker(self):
        rows = parse_lyrics_page("time=00:05.00\nzh=中文行\n==")
        assert rows == [(None, 0, "00:05.00", "zh", "中文行")]

    def test_equalless_line_skipped_template_closer_ends(self):
        rows = parse_lyrics_page("lyrics=\ntime=00:01.00\nja=x\n<br>\nja=x2\n}}\nja=zzz")
        assert (None, 0, "00:01.00", "ja", "x\nx2") in rows
        assert not any(r[4] == "zzz" for r in rows)

    def test_tabber_sections(self):
        src = (
            "<tabber>\nFirst=\nlyrics=\ntime=00:01.00\nja=a\n|-|\nSecond=\n"
            "lyrics=\nen=b\n==\n</tabber>"
        )
        rows = parse_lyrics_page(src)
        assert ("First", 0, "00:01.00", "ja", "a") in rows
        assert ("Second", 0, "<line-0>", "en", "b") in rows

    def test_none_source(self):
        assert parse_lyrics_page(None) == []

"""CSV conformance, mirroring the reference's edge-case tests
(delegate/LeadBulkExtractInputPluginTest.java:111-231 and
CsvTokenizerTest.java:11-39, fixtures F5)."""

import pytest

from embulk_input_marketo_ray.sources.csv_source import (
    CsvParseError,
    CsvTokenizer,
    QuotesPolicy,
    TooFewColumnsError,
    TooManyColumnsError,
    records_to_table,
)


def test_basic_header_keyed_records():
    t = records_to_table("id,name\n1,alice\n2,bob\n")
    assert t.column_names == ["id", "name"]
    assert t.column("name").to_pylist() == ["alice", "bob"]


def test_null_semantics_unquoted_empty_and_null_literal():
    # unquoted empty and the literal null -> null; QUOTED empty stays ""
    t = records_to_table('a,b,c\n,null,""\n')
    assert t.column("a").to_pylist() == [None]
    assert t.column("b").to_pylist() == [None]
    assert t.column("c").to_pylist() == [""]


def test_rfc4180_doubled_quote_is_literal():
    # fixtures/lead_extract_with_quote_RFC4180.csv: first""Name1 -> first"Name1
    t = records_to_table('id,firstName\n1,"first""Name1"\n')
    assert t.column("firstName").to_pylist() == ['first"Name1']


def test_stray_quote_errors_under_rfc_mode():
    # fixtures/lead_extract_with_quote_in_quote_field.csv under default policy
    with pytest.raises(CsvParseError):
        records_to_table('id,name\n1,"fir"stName"\n')


def test_stray_quotes_accepted_under_stray_mode():
    t = records_to_table(
        'id,name\n1,fir"stName\n',
        policy=QuotesPolicy.ACCEPT_STRAY_QUOTES_ASSUMING_NO_DELIMITERS_IN_FIELDS,
    )
    assert t.column("name").to_pylist() == ['fir"stName']


def test_stray_quote_inside_quoted_field_under_stray_mode():
    # the lead_extract_with_quote_in_quote_field.csv shape: quoted value
    # containing an unescaped quote parses under the stray policy
    t = records_to_table(
        'id,name\n1,"fir"stName"\n',
        policy=QuotesPolicy.ACCEPT_STRAY_QUOTES_ASSUMING_NO_DELIMITERS_IN_FIELDS,
    )
    assert t.column("name").to_pylist() == ['fir"stName']


def test_multiline_quoted_value():
    t = records_to_table('id,notes\n1,"line one\nline two"\n2,x\n')
    assert t.column("notes").to_pylist() == ["line one\nline two", "x"]


def test_quoted_size_limit():
    big = "x" * 1000
    with pytest.raises(CsvParseError):
        CsvTokenizer(max_quoted_size=100).parse(f'a\n"{big}"\n')


def test_too_few_and_too_many_columns():
    with pytest.raises(TooFewColumnsError):
        records_to_table("a,b,c\n1,2\n")
    with pytest.raises(TooManyColumnsError):
        records_to_table("a,b\n1,2,3\n")


def test_comment_marker_skips_lines():
    t = records_to_table("id,v\n#comment line\n1,2\n", comment_marker="#")
    assert t.num_rows == 1


def test_crlf_line_endings():
    t = records_to_table("id,v\r\n1,a\r\n2,b\r\n")
    assert t.column("v").to_pylist() == ["a", "b"]


def test_trailing_row_without_newline():
    t = records_to_table("id,v\n1,a")
    assert t.column("v").to_pylist() == ["a"]

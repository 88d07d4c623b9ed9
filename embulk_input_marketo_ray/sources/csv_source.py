"""CSV tokenizer with the reference's quote policies (SURVEY.md §2.2 M1-M3).

The reference carries a 780-line CSV state machine
(embulk-input-marketo's vendored CsvTokenizer.java:247-488) because
Marketo bulk-extract files are not reliably RFC 4180. The semantics
reproduced here:

- quote char, escape char, multi-line quoted values
  (CsvTokenizer.java:387-397);
- three stray-quote policies (CsvTokenizer.java:764-781):
  * ``NONE`` — a stray quote inside a quoted field is an error;
  * ``ACCEPT_ONLY_RFC4180_ESCAPED`` — a doubled quote inside a quoted
    field is a literal quote; anything else is an error;
  * ``ACCEPT_STRAY_QUOTES_ASSUMING_NO_DELIMITERS_IN_FIELDS`` — quotes
    are literal characters; assumes no delimiter ever appears inside a
    field;
- 128 KiB quoted-value size limit (CsvTokenizer.java:78-80,455-457);
- too-few / too-many column errors (CsvTokenizer.java:201-216,247-251);
- null semantics: unquoted-empty or the literal ``"null"`` is null
  (CsvTokenizer.java:490-514) — applied by ``records_to_table``;
  a QUOTED empty string stays an empty string.

Execution shape: the RFC path could use ``pyarrow.csv`` wholesale, but
the two non-RFC policies have no pyarrow equivalent, so parsing runs as
a per-payload Python state machine inside ``map_batches`` — one CSV
blob per bulk-extract slice, parallel across slices (the per-character
loop is bounded by payload size, not dataset size).
"""

from __future__ import annotations

from enum import Enum

import pyarrow as pa

MAX_QUOTED_SIZE = 128 * 1024  # CsvTokenizer.java:78-80


class QuotesPolicy(Enum):
    NONE = "none"
    ACCEPT_ONLY_RFC4180_ESCAPED = "rfc4180"
    ACCEPT_STRAY_QUOTES_ASSUMING_NO_DELIMITERS_IN_FIELDS = "stray"


class CsvParseError(ValueError):
    pass


class TooFewColumnsError(CsvParseError):
    pass


class TooManyColumnsError(CsvParseError):
    pass


class CsvTokenizer:
    """Character state machine: BEGIN -> VALUE / QUOTED_VALUE ->
    AFTER_QUOTED_VALUE, mirroring CsvTokenizer.java:28-36 states."""

    def __init__(
        self,
        delimiter: str = ",",
        quote: str = '"',
        escape: str = '"',
        policy: QuotesPolicy = QuotesPolicy.ACCEPT_ONLY_RFC4180_ESCAPED,
        comment_marker: str | None = None,
        max_quoted_size: int = MAX_QUOTED_SIZE,
    ) -> None:
        self.delimiter = delimiter
        self.quote = quote
        self.escape = escape
        self.policy = policy
        self.comment_marker = comment_marker
        self.max_quoted_size = max_quoted_size

    def parse(self, text: str) -> list[list[tuple[str, bool]]]:
        """Parse a whole payload into rows of (value, was_quoted) cells."""
        rows: list[list[tuple[str, bool]]] = []
        row: list[tuple[str, bool]] = []
        buf: list[str] = []
        quoted = False  # current cell was quoted
        in_quotes = False
        i, n = 0, len(text)
        d, q, e = self.delimiter, self.quote, self.escape
        stray_ok = self.policy is QuotesPolicy.ACCEPT_STRAY_QUOTES_ASSUMING_NO_DELIMITERS_IN_FIELDS
        cell_start = True

        def end_cell() -> None:
            nonlocal buf, quoted, cell_start
            row.append(("".join(buf), quoted))
            buf, quoted, cell_start = [], False, True

        def end_row() -> None:
            nonlocal row
            end_cell()
            if not (len(row) == 1 and row[0] == ("", False)):  # skip empty lines
                rows.append(row)
            else:
                pass
            row = []

        while i < n:
            c = text[i]
            if in_quotes:
                if len(buf) > self.max_quoted_size:
                    raise CsvParseError(
                        f"quoted value exceeds {self.max_quoted_size} bytes"
                    )
                if c == e and e != q and i + 1 < n and text[i + 1] == q:
                    buf.append(q)
                    i += 2
                    continue
                if c == q:
                    if i + 1 < n and text[i + 1] == q:
                        # doubled quote -> literal (RFC4180 escape)
                        buf.append(q)
                        i += 2
                        continue
                    in_quotes = False
                    i += 1
                    # after closing quote: must see delimiter/newline/EOF
                    if i < n and text[i] not in (d, "\n", "\r"):
                        if stray_ok:
                            buf.append(q)  # treat as literal, keep scanning
                            in_quotes = True
                            continue
                        raise CsvParseError(
                            f"stray character {text[i]!r} after quoted value"
                        )
                    continue
                buf.append(c)
                i += 1
                continue

            if c == q and cell_start:
                in_quotes = True
                quoted = True
                cell_start = False
                i += 1
                continue
            if c == q and self.policy is QuotesPolicy.NONE and not cell_start:
                raise CsvParseError("stray quote in unquoted value")
            if c == d:
                end_cell()
                i += 1
                continue
            if c == "\r":
                if i + 1 < n and text[i + 1] == "\n":
                    i += 1
                end_row()
                i += 1
                continue
            if c == "\n":
                end_row()
                i += 1
                continue
            if (
                self.comment_marker
                and cell_start
                and not row
                and text.startswith(self.comment_marker, i)
            ):
                nl = text.find("\n", i)
                i = n if nl < 0 else nl + 1
                buf = []
                continue
            buf.append(c)
            cell_start = False
            i += 1

        if in_quotes:
            raise CsvParseError("unterminated quoted value at end of input")
        if buf or row:
            end_row()
        return rows


def records_to_table(
    text: str,
    policy: QuotesPolicy = QuotesPolicy.ACCEPT_ONLY_RFC4180_ESCAPED,
    **tokenizer_kwargs,
) -> pa.Table:
    """Header-keyed all-string table (M2): first row is the header; each
    subsequent row must match its width (too-few/too-many errors).
    Null rule (M3): unquoted-empty and the literal ``null`` -> null;
    quoted empty stays ``""``."""
    rows = CsvTokenizer(policy=policy, **tokenizer_kwargs).parse(text)
    if not rows:
        return pa.table({})
    header = [v for v, _ in rows[0]]
    width = len(header)
    columns: list[list[str | None]] = [[] for _ in header]
    for lineno, row in enumerate(rows[1:], start=2):
        if len(row) < width:
            raise TooFewColumnsError(f"line {lineno}: {len(row)} < {width} columns")
        if len(row) > width:
            raise TooManyColumnsError(f"line {lineno}: {len(row)} > {width} columns")
        for col, (value, was_quoted) in zip(columns, row):
            if (value == "" and not was_quoted) or value == "null":
                col.append(None)
            else:
                col.append(value)
    return pa.table({name: pa.array(col, type=pa.string()) for name, col in zip(header, columns)})

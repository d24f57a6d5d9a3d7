"""PDF text extraction: roundtrips, byte-parser fuzz (CLAUDE.md: every
byte parser gets truncation + bitflip before it ships), bomb cap, and
the DataFrame skip path."""

import random
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sketch_spark.functions.pdftext import (
    _extract_text_ops,
    decode_pdf,
    encode_pdf,
    pdf_text_df,
)

PAGES = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=120
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=60, deadline=None)
@given(pages=PAGES, compress=st.booleans())
def test_roundtrip_any_text(pages, compress):
    """decode(encode(pages)) recovers the exact page strings — parens,
    backslashes, newlines, unicode — through raw and Flate streams."""
    n_pages, n_objects, text = decode_pdf(encode_pdf(pages, compress=compress))
    assert n_pages == len(pages)
    assert n_objects == 3 + 2 * len(pages)
    assert text == "\n".join(pages)


def test_hex_strings_and_tj_arrays():
    """Hand-built content exercising the operators the encoder doesn't
    emit: TJ arrays with kerning numbers, hex strings, ' and "."""
    content = (
        b"BT [(ab) -120 (cd)] TJ <20> Tj (x) ' 1 2 (y) \" ET"
    )
    blob = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Page >>\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n"
    )
    n_pages, n_objects, text = decode_pdf(blob)
    assert (n_pages, n_objects) == (1, 2)
    assert text == "abcd xy"


def test_literal_escapes_and_octal():
    content = rb"BT (\101\102\103 \( \) \\ \n ok) Tj ET"
    blob = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
    )
    assert decode_pdf(blob)[2] == "ABC ( ) \\ \n ok"


def test_stream_payload_never_miscounted():
    """'N G obj' / 'endobj' byte patterns INSIDE a stream payload must
    not inflate the object count or derail the scan."""
    payload = b"9 0 obj endobj 3 0 obj BT (trap) Tj ET endstream"
    blob = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(payload)).encode()
        + b" >>\nstream\n" + payload + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Type /Page >>\nendobj\n"
    )
    n_pages, n_objects, text = decode_pdf(blob)
    assert n_objects == 2
    assert n_pages == 1
    assert text == "trap"


def test_zlib_bomb_capped():
    payload = zlib.compress(b"BT (x) Tj ET" + b"\x00" * (1 << 24))
    blob = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(payload)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + payload
        + b"\nendstream\nendobj\n"
    )
    with pytest.raises(ValueError, match="cap"):
        decode_pdf(blob, max_stream_bytes=1 << 16)


def test_unsupported_surface_is_honest():
    blob = encode_pdf(["x"]).replace(b"/FlateDecode", b"/LZWDecode")
    with pytest.raises(ValueError, match="not a PDF"):
        decode_pdf(b"GIF89a not a pdf")
    with pytest.raises(NotImplementedError, match="filter"):
        content = b"BT (x) Tj ET"
        decode_pdf(
            b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
            + b" /Filter /LZWDecode >>\nstream\n" + content
            + b"\nendstream\nendobj\n"
        )
    with pytest.raises(NotImplementedError, match="indirect"):
        decode_pdf(
            b"%PDF-1.4\n1 0 obj\n<< /Length 2 0 R >>\nstream\nBT (x) Tj ET"
            b"\nendstream\nendobj\n"
        )
    with pytest.raises(NotImplementedError, match="encrypted"):
        decode_pdf(b"%PDF-1.4\n1 0 obj\n<< /Encrypt 2 0 R >>\nendobj\n")


def test_truncation_and_bitflip_never_escape():
    blob = encode_pdf(["fuzz target (page) one", "two"], compress=True)
    for cut in range(len(blob)):
        try:
            decode_pdf(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
    rng = random.Random(7)
    for _ in range(1500):
        mutated = bytearray(blob)
        i = rng.randrange(len(mutated))
        mutated[i] ^= 1 << rng.randrange(8)
        try:
            decode_pdf(bytes(mutated))
        except (ValueError, NotImplementedError):
            pass


def test_pdf_text_df_skip_and_extract(spark):
    rows = [
        (1, encode_pdf(["alpha", "beta"], compress=False)),
        (2, encode_pdf(["gamma"], compress=True)),
        (3, b"not a pdf at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, doc binary")
    out = {
        r["doc_id"]: r
        for r in pdf_text_df(df, "doc", "doc_id").collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["text"] == "alpha\nbeta"
    assert out[1]["n_pages"] == 2
    assert out[1]["n_objects"] == 7
    assert out[2]["text"] == "gamma"
    with pytest.raises(Exception):
        pdf_text_df(df, "doc", "doc_id", on_error="raise").collect()


def test_inline_dict_operands_do_not_eat_text():
    """Review r5: '<<' fell through to the hex-string parser, raised,
    and decode_pdf's non-content fallback silently dropped the whole
    stream's text — BDC/DP marked-content dicts are ubiquitous in
    tagged PDFs."""
    ops = _extract_text_ops(b"/Tag << /K /V >> BDC BT (Hello) Tj ET EMC")
    assert ops == [b"Hello"]
    # '>>' alone (nested dict close) must also be stepped over
    assert _extract_text_ops(b"<< /A << /B 1 >> >> BDC (Hi) Tj") == [b"Hi"]
    # a real hex string right after a dict still parses
    assert _extract_text_ops(b"<< /K /V >> BDC <48:69> Tj".replace(b":", b"")) == [
        b"Hi"
    ]


def test_marked_content_pdf_end_to_end():
    content = b"/P << /MCID 0 >> BDC BT (Tagged text) Tj ET EMC"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Page >> endobj\n"
        + b"2 0 obj << /Length "
        + str(len(content)).encode()
        + b" >> stream\n"
        + content
        + b"\nendstream endobj\n%%EOF"
    )
    assert decode_pdf(pdf) == (1, 2, "Tagged text")

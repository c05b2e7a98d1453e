from leann_tpu.chunker import Chunk, ChunkingStrategy, SmartChunker
from leann_tpu.chunker.simple import SimpleChunker
from leann_tpu.chunker.code import CodeChunker


def test_simple_short_text():
    chunks = SimpleChunker(256, 128).chunk("hello world", "a.txt")
    assert len(chunks) == 1
    assert chunks[0].text == "hello world"
    assert chunks[0].metadata["chunk_type"] == "simple"
    assert chunks[0].metadata["source"] == "a.txt"


def test_simple_overlap_and_coverage():
    words = " ".join(f"word{i}" for i in range(2000))
    chunks = SimpleChunker(64, 32).chunk(words, "a.txt")
    assert len(chunks) > 1
    # every chunk within window budget
    for c in chunks:
        assert len(c.text) <= 64 * 4 + 1
    # overlap: consecutive chunks share content
    assert chunks[0].text.split()[-1] in chunks[1].text.split()
    # coverage: last word present
    assert "word1999" in chunks[-1].text


def test_simple_no_infinite_loop_on_long_token():
    text = "x" * 5000  # no whitespace at all
    chunks = SimpleChunker(16, 8).chunk(text, "a.txt")
    assert len(chunks) > 1
    assert sum(len(c.text) for c in chunks) >= 5000


def test_empty_text():
    assert SimpleChunker().chunk("   ", "a.txt") == []


def test_code_chunker_rust_fn():
    src = """\
use std::io;

pub fn parse_input(s: &str) -> u32 {
    s.trim().parse().unwrap()
}

struct Config {
    value: u32,
}
"""
    chunks = CodeChunker(256, 128).chunk(src, "main.rs")
    names = [c.metadata.get("name") for c in chunks if c.metadata.get("chunk_type") == "code"]
    assert "parse_input" in names
    assert "Config" in names
    fn_chunk = next(c for c in chunks if c.metadata.get("name") == "parse_input")
    assert "s.trim().parse()" in fn_chunk.text
    assert fn_chunk.metadata["language"] == "rust"
    # the `use` line becomes a context chunk
    assert any(c.metadata.get("chunk_type") == "context" for c in chunks)


def test_code_chunker_python_class():
    src = """\
import os

class Greeter:
    def __init__(self, name):
        self.name = name

    def greet(self):
        return f"hi {self.name}"

def main():
    print(Greeter("x").greet())
"""
    chunks = CodeChunker(256, 128).chunk(src, "app.py")
    code = [c for c in chunks if c.metadata.get("chunk_type") == "code"]
    names = [c.metadata.get("name") for c in code]
    assert "Greeter" in names
    assert "main" in names
    cls = next(c for c in code if c.metadata["name"] == "Greeter")
    assert "def greet" in cls.text  # methods stay inside the class block


def test_code_chunker_fallback_unknown_lang():
    chunks = CodeChunker().chunk("plain text " * 50, "notes.xyz")
    assert all(c.metadata["chunk_type"] == "simple" for c in chunks)


def test_smart_chunker_routing():
    smart = SmartChunker(strategy=ChunkingStrategy.AUTO)
    code_chunks = smart.chunk("def f():\n    return 1\n", "a.py")
    assert any(c.metadata.get("chunk_type") == "code" for c in code_chunks)
    text_chunks = smart.chunk("just some text", "a.md")
    assert all(c.metadata["chunk_type"] == "simple" for c in text_chunks)


def test_strategy_parse():
    assert ChunkingStrategy.parse("ast") == ChunkingStrategy.AST
    assert ChunkingStrategy.parse("AUTO") == ChunkingStrategy.AUTO
    try:
        ChunkingStrategy.parse("bogus")
        assert False
    except ValueError:
        pass


def test_oversize_block_split():
    body = "\n".join(f"    x{i} = {i}" for i in range(400))
    src = f"def big():\n{body}\n"
    chunks = CodeChunker(64, 16).chunk(src, "big.py")
    code = [c for c in chunks if c.metadata.get("chunk_type") == "code"]
    assert len(code) > 1  # split
    assert all(c.metadata["name"] == "big" for c in code)


# ------------------------------------------------------------- PDF loading


def _make_pdf(path, page_texts, compress=True):
    """Write a minimal single-font PDF with one content stream per page."""
    import zlib

    objs = []
    page_ids = [4 + 2 * i for i in range(len(page_texts))]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_texts)} >>".encode()
    )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, text in enumerate(page_texts):
        esc = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        content = f"BT /F1 12 Tf 72 720 Td ({esc}) Tj ET".encode("latin-1")
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b"/Filter /FlateDecode "
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /Contents {page_ids[i] + 1} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >> >>".encode()
        )
        objs.append(
            b"<< " + filt + f"/Length {len(content)} >>\nstream\n".encode()
            + content + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    with open(path, "wb") as f:
        f.write(bytes(out))


def test_pdf_text_extraction_flate(tmp_path):
    from leann_tpu.utils.pdftext import extract_pdf_text

    p = tmp_path / "doc.pdf"
    _make_pdf(str(p), ["Hello TPU world (with parens)", "Second page text"])
    text = extract_pdf_text(str(p))
    assert "Hello TPU world (with parens)" in text
    assert "Second page text" in text


def test_pdf_text_extraction_uncompressed_and_tj_array(tmp_path):
    from leann_tpu.utils.pdftext import extract_pdf_text

    p = tmp_path / "doc.pdf"
    _make_pdf(str(p), ["plain stream body"], compress=False)
    text = extract_pdf_text(str(p))
    assert "plain stream body" in text


def test_load_file_content_reads_pdf(tmp_path):
    from leann_tpu.cli.common import load_file_content

    p = tmp_path / "notes.pdf"
    _make_pdf(str(p), ["bm25 ranking inside a pdf"])
    text = load_file_content(str(p))
    assert text is not None and "bm25 ranking inside a pdf" in text


def test_load_file_content_pdf_no_text(tmp_path):
    from leann_tpu.cli.common import load_file_content

    p = tmp_path / "empty.pdf"
    p.write_bytes(b"%PDF-1.4\nnothing here\n%%EOF\n")
    assert load_file_content(str(p)) is None

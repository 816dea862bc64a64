"""Pin the ASCII invariant the fake multimodal kernels' oracles lean on.

The fake codecs hash/slice the utf-8 BYTES of documents.text while most
DuckDB oracles use character functions (length, substr, md5-of-substr);
the two agree only while the driver-generated testdata is pure ASCII.
The driver regenerates /root/testdata each round — if it ever emits
non-ASCII text, this test fails loudly instead of the mm oracles
hash-mismatching mysteriously. (ext_mm_decode_dims already uses
octet_length(encode(text)) and is byte-correct regardless.)
"""

import glob

import pyarrow.parquet as pq

from tests.conftest import SF0001, SF001


def _all_ascii(path):
    col = pq.read_table(path, columns=["text"]).column("text")
    for chunk in col.chunks:
        for v in chunk.to_pylist():
            if v is not None and not v.isascii():
                return False
    return True


def test_documents_text_is_ascii():
    for sf_dir in (SF0001, SF001):
        for path in glob.glob(f"{sf_dir}/documents.parquet"):
            assert _all_ascii(path), (
                f"{path}: non-ASCII text — the char-based mm oracles "
                "(attach_meta/resize/frame_sample) no longer match the "
                "byte-based fake codecs; switch them to "
                "octet_length(encode(text)) / byte slicing."
            )

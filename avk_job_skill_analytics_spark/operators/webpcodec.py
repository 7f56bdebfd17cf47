"""VP8L (lossless WebP) codec — pure stdlib, no image libraries.

Round 11 closes the raster-codec ledger's last row: the engine
already decodes PNG (zlib + five-filter), 24-bit BMP, and
baseline-sequential JPEG (operators/jpegcodec) for real; this module
adds the lossless half of WebP (RFC 9649, "WebP Lossless Bitstream
Specification"):

- :func:`decode_webp_pixels` — a REAL decoder for the VP8L subset a
  transform-free encoder emits: RIFF chunk walk to the VP8L chunk,
  LSB-first bit reading, the SUBTRACT_GREEN transform, color-cache
  decoding, BOTH prefix-code forms (2-symbol "simple" codes and
  normal codes carried via the 19-symbol code-length code with
  repeat codes 16/17/18 and the early-stop max_symbol field),
  canonical table construction with an exact Kraft-completeness
  check, literal ARGB decoding, and LZ77 backward references with
  linear distance codes. Out-of-subset features quarantine
  (return None, never raise): the spatial/color/palette transforms,
  entropy-image meta prefix codes, and the 120 short 2D-neighborhood
  distance codes (their mapping is a 120-entry table from the spec
  that this module does not vendor — a wrong table would decode
  plausibly and corrupt silently, the worst failure mode for a
  hash-gated pipeline).

- :func:`build_webp_pixels` — a REAL encoder used to synthesize test
  assets: transform-free, literal-only VP8L with either normal
  canonical prefix codes (a Kraft-complete uniform 8-bit code over
  all 256 channel values, emitted through the code-length code with
  repeat-16/18 runs) or "simple" 1-2 symbol codes (for images with
  at most two distinct values per channel — 1 bit per pixel per
  channel). Alpha is a constant-255 one-symbol code (zero bits per
  pixel); the distance code is a one-symbol placeholder. The output
  is a fully valid lossless WebP: any external decoder
  (libwebp/Pillow/browsers) opens it, and lossless means the decode
  is bit-exact — so an analytic SQL oracle replays every channel sum
  (registry/scale_queries.mm_webp_pixel_stats).

Reference parity: the reference pipeline treats media as opaque
payloads (SURVEY.md §2.10); real decode belongs to the
beyond-reference multimodal family. Header-level WebP geometry
parsing stays in multimodal._parse_webp; this module owns pixels.
"""

from __future__ import annotations

import struct

__all__ = ["build_webp_pixels", "decode_webp_pixels"]

# order in which code-length-code lengths are transmitted (RFC 9649)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
             13, 14, 15)
_MAX_CODE_LEN = 15
_NUM_LENGTH_CODES = 24  # LZ77 length prefix codes in the green alphabet
_CACHE_MUL = 0x1E35A7BD  # color-cache hash multiplier (RFC 9649 §5.2)


# ------------------------------------------------------------------
# bit IO — VP8L streams are read LSB-first within each byte; prefix
# codes are the exception: their bits are transmitted starting with
# the code's most-significant bit (the DEFLATE convention).


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value: int, count: int) -> None:
        """Append ``count`` bits of ``value``, LSB first."""
        self.acc |= (value & ((1 << count) - 1)) << self.n
        self.n += count
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def code(self, code: int, length: int) -> None:
        """Append a prefix code, MSB of the code first."""
        for i in range(length - 1, -1, -1):
            self.bits((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte position
        self.bitpos = 0

    def bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError
        b = (self.data[self.pos] >> self.bitpos) & 1
        self.bitpos += 1
        if self.bitpos == 8:
            self.bitpos = 0
            self.pos += 1
        return b

    def bits(self, count: int) -> int:
        v = 0
        for i in range(count):
            v |= self.bit() << i
        return v


# ------------------------------------------------------------------
# canonical prefix codes (DEFLATE-style assignment: sort by
# (length, symbol), codes increment within a length, shift left when
# the length grows)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a valid code-length array."""
    bl_count = [0] * (_MAX_CODE_LEN + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    next_code = [0] * (_MAX_CODE_LEN + 2)
    code = 0
    for ln in range(1, _MAX_CODE_LEN + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


def _decode_table(lengths: list[int]):
    """Decoder table from a code-length array: ("single", sym) for a
    one-symbol code (zero bits per read), else {(length, code): sym}
    — or None when the lengths are not an exactly-complete (Kraft
    equality) prefix code, which quarantines the whole payload."""
    used = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
    if not used:
        return None
    if len(used) == 1:
        return ("single", used[0][0])
    maxlen = max(ln for _, ln in used)
    if maxlen > _MAX_CODE_LEN:
        return None
    if sum(1 << (maxlen - ln) for _, ln in used) != (1 << maxlen):
        return None
    return {(ln, code): sym
            for sym, (code, ln) in _canonical_codes(lengths).items()}


def _read_symbol(br: _BitReader, table) -> int:
    if isinstance(table, tuple):  # ("single", sym): zero-bit code
        return table[1]
    code, ln = 0, 0
    while ln < _MAX_CODE_LEN:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid prefix code")


# ------------------------------------------------------------------
# encoder


def _write_simple_code(bw: _BitWriter, symbols: list[int]) -> dict:
    """Emit a VP8L "simple" prefix code (1 or 2 symbols; both
    written as 8-bit values) and return the symbol->(code, length)
    map. A one-symbol code costs zero bits per read; two symbols get
    1 bit each, code 0 on the numerically smaller symbol (canonical
    order)."""
    symbols = sorted(symbols)
    bw.bits(1, 1)                       # simple
    bw.bits(len(symbols) - 1, 1)        # num_symbols - 1
    bw.bits(1, 1)                       # first symbol in 8 bits
    bw.bits(symbols[0], 8)
    if len(symbols) == 2:
        bw.bits(symbols[1], 8)
        return {symbols[0]: (0, 1), symbols[1]: (1, 1)}
    return {symbols[0]: (0, 0)}


def _write_uniform8_code(bw: _BitWriter, alphabet_size: int) -> dict:
    """Emit a normal (code-length-coded) prefix code assigning an
    8-bit code to every value 0..255 — Kraft-complete (256 x 2^-8 =
    1) regardless of which values the image uses, and the canonical
    code for symbol s is simply s. Transmission: code-length code
    over {8: len 1, 16: len 2, 18: len 2}, then one literal '8'
    followed by repeat-16 runs to 256; alphabets larger than 256 (the
    green channel's 256+24 literals+lengths) close the remaining
    symbols with one repeat-18 zero run."""
    bw.bits(0, 1)                       # not simple
    # code-length-code lengths at _CL_ORDER positions 0..11:
    # symbol 18 -> 2 (order idx 1), 16 -> 2 (idx 8), 8 -> 1 (idx 11)
    bw.bits(12 - 4, 4)                  # num_code_lengths = 12
    cl_lengths = [0, 2, 0, 0, 0, 0, 0, 0, 2, 0, 0, 1]
    if alphabet_size == 256:
        cl_lengths[1] = 0               # no zero runs needed: drop 18
        cl_lengths[8] = 1               # {8,16} both length 1 (Kraft)
    for ln in cl_lengths:
        bw.bits(ln, 3)
    # canonical code-length code: 8 -> 0 (1 bit); 16 -> 10, 18 -> 11
    cl = {8: (0, 1), 16: (2, 2), 18: (3, 2)} if cl_lengths[1] \
        else {8: (0, 1), 16: (1, 1)}
    bw.bits(0, 1)                       # no max_symbol early stop
    bw.code(*cl[8])                     # symbol 0: length 8
    remaining = 255                     # then repeat-16 runs (3..6)
    while remaining:
        rep = min(6, remaining)
        if remaining - rep in (1, 2):   # never strand a <3 tail
            rep = remaining - 3
        bw.code(*cl[16])
        bw.bits(rep - 3, 2)
        remaining -= rep
    zeros = alphabet_size - 256
    if zeros:                           # close the alphabet: 18 run
        bw.code(*cl[18])
        bw.bits(zeros - 11, 7)
    return {s: (s, 8) for s in range(256)}


def build_webp_pixels(width: int, height: int, rgb_fn,
                      simple: bool = False) -> bytes:
    """FULL valid lossless WebP from a pixel function
    ``(x, y) -> (r, g, b)``: RIFF container, VP8L header, no
    transforms, no color cache, literal-only coding. ``simple=False``
    uses uniform 8-bit normal codes (any byte values); ``simple=True``
    uses 1-bit "simple" codes and requires at most two distinct
    values per channel (raises ValueError otherwise). Alpha is a
    constant 255. Lossless: the decode is bit-exact, so channel sums
    replay in a SQL oracle."""
    if not (1 <= width <= 0x4000 and 1 <= height <= 0x4000):
        raise ValueError("dimensions out of VP8L 14-bit range")
    pixels = [rgb_fn(x, y) for y in range(height) for x in range(width)]
    bw = _BitWriter()
    bw.bits(width - 1, 14)
    bw.bits(height - 1, 14)
    bw.bits(0, 1)                       # alpha_is_used = 0
    bw.bits(0, 3)                       # version = 0
    bw.bits(0, 1)                       # no transforms
    bw.bits(0, 1)                       # no color cache
    bw.bits(0, 1)                       # no meta prefix codes
    # five prefix codes, spec order: green, red, blue, alpha, distance
    if simple:
        chans = [sorted({px[c] for px in pixels}) for c in range(3)]
        if any(len(vals) > 2 for vals in chans):
            raise ValueError("simple codes need <=2 values per channel")
        g_code = _write_simple_code(bw, chans[1])
        r_code = _write_simple_code(bw, chans[0])
        b_code = _write_simple_code(bw, chans[2])
    else:
        g_code = _write_uniform8_code(bw, 256 + _NUM_LENGTH_CODES)
        r_code = _write_uniform8_code(bw, 256)
        b_code = _write_uniform8_code(bw, 256)
    _write_simple_code(bw, [255])       # alpha: constant, 0 bits/px
    _write_simple_code(bw, [0])         # distance: unused placeholder
    for r, g, b in pixels:
        bw.code(*g_code[g])
        bw.code(*r_code[r])
        bw.code(*b_code[b])
    data = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"                # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# ------------------------------------------------------------------
# decoder


def _read_prefix_code(br: _BitReader, alphabet_size: int):
    """ReadHuffmanCode (RFC 9649 §5.2.2): simple form (1-2 listed
    symbols) or normal form (code lengths transmitted through the
    19-symbol code-length code, with repeat codes 16/17/18 and the
    optional max_symbol early stop)."""
    if br.bits(1):                      # simple
        num_symbols = br.bits(1) + 1
        first_8bit = br.bits(1)
        s0 = br.bits(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if s0 >= alphabet_size:
            return None
        if num_symbols == 2:
            s1 = br.bits(8)
            if s1 >= alphabet_size or s1 == s0:
                return None
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1
        return _decode_table(lengths)
    num_code_lengths = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_table = _decode_table(cl_lengths)
    if cl_table is None:
        return None
    if br.bits(1):                      # max_symbol early stop
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
        if max_symbol > alphabet_size:
            return None
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol, prev_len = 0, 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = _read_symbol(br, cl_table)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + br.bits(2), prev_len
            elif code_len == 17:
                repeat, fill = 3 + br.bits(3), 0
            else:
                repeat, fill = 11 + br.bits(7), 0
            if symbol + repeat > alphabet_size:
                return None
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _decode_table(lengths)


def _lz77_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix decoding: codes 0..3 map to 1..4;
    larger codes carry (code-2)>>1 extra bits (RFC 9649 §5.2.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def decode_webp_pixels(payload: bytes):
    """REAL lossless-WebP pixel decode for the transform-free VP8L
    subset (module docstring): returns (width, height, channels,
    raw_pixels) row-major top-down — RGB, or RGBA when the header
    declares alpha in use — or None for anything outside the subset
    (lossy VP8, transforms other than SUBTRACT_GREEN, entropy-image
    meta codes, short 2D distance codes): quarantine-and-continue,
    like every other decoder in the multimodal family."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    try:
        off, data = 12, None
        while off + 8 <= len(payload):
            cid = payload[off:off + 4]
            (csz,) = struct.unpack("<I", payload[off + 4:off + 8])
            if cid == b"VP8L":
                data = payload[off + 8:off + 8 + csz]
                break
            off += 8 + csz + (csz & 1)
        if data is None or len(data) < 5 or data[0] != 0x2F:
            return None
        br = _BitReader(data, 1)
        w = br.bits(14) + 1
        h = br.bits(14) + 1
        alpha_used = br.bits(1)
        if br.bits(3) != 0:             # version must be 0
            return None
        subtract_green = False
        while br.bits(1):               # transform list
            if br.bits(2) == 2:         # SUBTRACT_GREEN: no payload
                subtract_green = True
            else:                       # predictor / color / palette
                return None
        cache_bits = br.bits(4) if br.bits(1) else 0
        if cache_bits > 11:
            return None
        cache_size = (1 << cache_bits) if cache_bits else 0
        cache = [0] * cache_size
        if br.bits(1):                  # entropy image (meta codes)
            return None
        green = _read_prefix_code(br, 256 + _NUM_LENGTH_CODES + cache_size)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        if None in (green, red, blue, alpha, dist):
            return None
        n = w * h
        argb = [0] * n
        pos = 0
        cache_shift = 32 - cache_bits if cache_bits else 0

        def emit(px: int) -> None:
            nonlocal pos
            argb[pos] = px
            pos += 1
            if cache_bits:
                cache[(_CACHE_MUL * px & 0xFFFFFFFF) >> cache_shift] = px

        while pos < n:
            s = _read_symbol(br, green)
            if s < 256:
                g = s
                r = _read_symbol(br, red)
                b = _read_symbol(br, blue)
                a = _read_symbol(br, alpha)
                emit((a << 24) | (r << 16) | (g << 8) | b)
            elif s < 256 + _NUM_LENGTH_CODES:
                length = _lz77_value(s - 256, br)
                dcode = _lz77_value(_read_symbol(br, dist), br)
                if dcode <= 120:        # 2D neighborhood map: subset
                    return None
                d = dcode - 120
                if d < 1 or d > pos or pos + length > n:
                    return None
                for _ in range(length):
                    emit(argb[pos - d])
            else:
                if not cache_bits:
                    return None
                emit(cache[s - 256 - _NUM_LENGTH_CODES])
    except (EOFError, ValueError, IndexError, struct.error):
        return None
    ch = 4 if alpha_used else 3
    out = bytearray(n * ch)
    for i, px in enumerate(argb):
        g = (px >> 8) & 255
        r = (px >> 16) & 255
        b = px & 255
        if subtract_green:
            r = (r + g) & 255
            b = (b + g) & 255
        o = i * ch
        out[o], out[o + 1], out[o + 2] = r, g, b
        if ch == 4:
            out[o + 3] = (px >> 24) & 255
    return w, h, ch, bytes(out)

"""Minimal from-scratch legacy .doc (Word 97+ binary) text extraction.

Fills the E9 slot the reference covers by shelling to antiword/catdoc
(pass_doc.py:85-102): there is no pure-Python equivalent to vendored,
so this module implements the two public formats involved directly
from their published specs (MS-CFB compound file container, MS-DOC
FIB + piece table):

- `_cfb_streams`: OLE2/CFB reader — header, DIFAT, FAT chains,
  directory tree (walked linearly), miniFAT + mini stream for
  streams under the 4096-byte cutoff.
- `doc_text`: WordDocument stream FIB (wIdent 0xA5EC, the
  fWhichTblStm flag selecting 0Table/1Table, ccpText, fcClx/lcbClx)
  -> CLX in the table stream -> PlcPcd piece table -> per-piece
  decode (fc bit 30: cp1252 single-byte vs UTF-16LE) -> main-body
  CP range only.
- `build_doc`: deterministic writer for fixtures (valid CFB with
  mini-stream layout; single / multi / unicode piece tables).

Exact byte parity with antiword is NOT a goal (antiword re-layouts
text, renders tables with ASCII art, and varies by version — no
stable contract exists); the deterministic contract here is: piece
text in CP order, paragraph mark (\\r), cell/row marks (\\x07), line
breaks (\\x0b) and page breaks (\\x0c) all normalized to "\\n", field
instructions (between \\x13 and \\x14) dropped, remaining C0 controls
removed. The reference's dispatch/cutoff/error semantics ARE
reproduced exactly (pass_doc.py:203-258): method doc_text, cutoff
PASS_DOC_CUTOFF (0.75, entrypoint.sh:37), failures record
doc_extract_error.
"""
from __future__ import annotations

import re
import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC

# bound every chain walk: a corrupt FAT with a cycle must error, not spin
_MAX_SECTORS = 1 << 20


class DocParseError(ValueError):
    """Structurally invalid CFB / non-Word payload."""


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def _chain(start: int, fat: list[int], what: str) -> list[int]:
    out, sid = [], start
    while sid != _ENDOFCHAIN:
        if sid >= len(fat) or len(out) > _MAX_SECTORS:
            raise DocParseError(f"cfb: broken {what} chain at sector {sid}")
        out.append(sid)
        sid = fat[sid]
    return out


def _cfb_streams(data: bytes) -> dict[str, bytes]:
    """Read every stream of a CFB compound file into {name: bytes}.

    The directory is walked linearly (every non-free entry), not via
    the red-black tree — storage nesting is ignored, which is enough
    for .doc files where WordDocument/0Table/1Table live at the root.
    """
    if len(data) < 512 or not data.startswith(_CFB_MAGIC):
        raise DocParseError("cfb: bad magic")
    sect_shift = _u16(data, 0x1E)
    if sect_shift not in (9, 12):
        raise DocParseError(f"cfb: bad sector shift {sect_shift}")
    ssz = 1 << sect_shift
    mini_shift = _u16(data, 0x20)
    mini_size = 1 << mini_shift
    n_fat = _u32(data, 0x2C)
    first_dir = _u32(data, 0x30)
    mini_cutoff = _u32(data, 0x38)
    first_minifat = _u32(data, 0x3C)
    n_minifat = _u32(data, 0x40)
    first_difat = _u32(data, 0x44)
    n_difat = _u32(data, 0x48)

    def sector(sid: int) -> bytes:
        off = (sid + 1) * ssz
        if off + ssz > len(data):
            raise DocParseError(f"cfb: sector {sid} beyond EOF")
        return data[off:off + ssz]

    # DIFAT: 109 header entries + optional extended DIFAT sectors.
    # Whole-block struct.unpack, not per-entry _u32: FAT tables are
    # the bulk of every parse (340k u32 calls across a 2k-doc batch
    # profiled before this)
    n_per = ssz // 4
    difat = list(struct.unpack_from("<109I", data, 0x4C))
    sid, seen = first_difat, 0
    while sid not in (_ENDOFCHAIN, _FREESECT):
        if seen > n_difat + 16:
            raise DocParseError("cfb: DIFAT cycle")
        vals = struct.unpack(f"<{n_per}I", sector(sid))
        difat.extend(vals[:-1])
        sid = vals[-1]
        seen += 1
    fat_sectors = [s for s in difat if s != _FREESECT][:n_fat]

    fat: list[int] = []
    for s in fat_sectors:
        fat.extend(struct.unpack(f"<{n_per}I", sector(s)))

    def read_chain(start: int, what: str) -> bytes:
        return b"".join(sector(s) for s in _chain(start, fat, what))

    dir_raw = read_chain(first_dir, "directory")
    entries = []
    for off in range(0, len(dir_raw), 128):
        ent = dir_raw[off:off + 128]
        name_len = _u16(ent, 0x40)
        etype = ent[0x42]
        if etype == 0 or name_len < 2:  # unused entry
            continue
        name = ent[: name_len - 2].decode("utf-16-le", errors="replace")
        start = _u32(ent, 0x74)
        size = _u32(ent, 0x78)  # low 32 bits; .doc streams fit
        entries.append((name, etype, start, size))
    if not entries or entries[0][1] != 5:
        raise DocParseError("cfb: missing root entry")
    _root_name, _t, mini_start, mini_total = entries[0]

    minifat: list[int] = []
    if n_minifat and first_minifat not in (_ENDOFCHAIN, _FREESECT):
        raw = read_chain(first_minifat, "miniFAT")
        minifat = list(struct.unpack(f"<{len(raw) // 4}I", raw))
    ministream = (
        read_chain(mini_start, "ministream")[:mini_total]
        if mini_total else b"")

    streams: dict[str, bytes] = {}
    for name, etype, start, size in entries[1:]:
        if etype != 2:  # storages/unknown skipped
            continue
        if size < mini_cutoff:
            chunks, sid, n = [], start, 0
            while sid != _ENDOFCHAIN:
                if sid >= len(minifat) or n > _MAX_SECTORS:
                    raise DocParseError(
                        f"cfb: broken mini chain for {name!r}")
                chunks.append(
                    ministream[sid * mini_size:(sid + 1) * mini_size])
                sid = minifat[sid]
                n += 1
            streams[name] = b"".join(chunks)[:size]
        else:
            streams[name] = read_chain(start, name)[:size]
    return streams


# --------------------------------------------------------------------------
# MS-DOC: FIB -> CLX -> piece table -> text
# --------------------------------------------------------------------------
_FIB_WIDENT = 0xA5EC
_OFF_FLAGS = 0x000A       # FibBase bitfield; 0x0200 = fWhichTblStm
_OFF_CCPTEXT = 0x004C     # FibRgLw97.ccpText (main body CP count)
_OFF_FCCLX = 0x01A2       # FibRgFcLcb97.fcClx
_OFF_LCBCLX = 0x01A6      # FibRgFcLcb97.lcbClx


def _pieces(clx: bytes) -> list[tuple[int, int, int, bool]]:
    """CLX -> [(cp_start, cp_end, byte_offset, compressed)].

    CLX = RgPrc (clxt=0x01 property blocks, skipped) then one Pcdt
    (clxt=0x02) holding the PlcPcd: n+1 CPs followed by n 8-byte PCDs
    whose fc field carries the text offset and the bit-30
    'compressed' (cp1252 one-byte) flag.
    """
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:
        if pos + 3 > len(clx):
            raise DocParseError("doc: truncated Prc in CLX")
        pos += 3 + _u16(clx, pos + 1)
    if pos >= len(clx) or clx[pos] != 0x02:
        raise DocParseError("doc: CLX has no Pcdt")
    lcb = _u32(clx, pos + 1)
    plc = clx[pos + 5:pos + 5 + lcb]
    if len(plc) != lcb or lcb < 4 or (lcb - 4) % 12:
        raise DocParseError("doc: malformed PlcPcd")
    n = (lcb - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    out = []
    for i in range(n):
        fc_field = _u32(plc, 4 * (n + 1) + 8 * i + 2)
        compressed = bool(fc_field & 0x40000000)
        fc = fc_field & 0x3FFFFFFF
        out.append((cps[i], cps[i + 1],
                    fc // 2 if compressed else fc, compressed))
    return out


# field instruction: \x13 opens, text (including nested \x13) runs
# until the separator \x14 (result text follows, kept) or end \x15;
# an unterminated instruction swallows to end-of-string — exactly the
# per-char loop this replaced (kept as _normalize_ref in test_doc_mini
# with a randomized parity check)
_FIELD_INSTR_RE = re.compile("\x13[^\x14\x15]*[\x14\x15]?")

# C0 translation table: paragraph/cell/line/page marks -> "\n",
# non-breaking hyphen -> "-", tab/newline kept, every other control
# (incl. stray \x14/\x15 field marks) dropped. str.translate runs the
# whole mapping in C — this was 1/3 of doc_text's profile as a loop.
_NORM_TABLE: dict[int, str | None] = {o: None for o in range(0x20)}
_NORM_TABLE[ord("\t")] = "\t"
_NORM_TABLE[ord("\n")] = "\n"
for _c in ("\r", "\x07", "\x0b", "\x0c"):
    _NORM_TABLE[ord(_c)] = "\n"
_NORM_TABLE[0x1E] = "-"


def _normalize(raw: str) -> str:
    """Word control characters -> plain text (module-doc contract)."""
    if "\x13" in raw:
        raw = _FIELD_INSTR_RE.sub("", raw)
    return raw.translate(_NORM_TABLE).rstrip("\n")


def doc_text(payload: bytes) -> str:
    """Main-body text of a legacy .doc (Word 97-2003 binary) payload.

    Raises DocParseError for structurally broken CFB / piece tables;
    raises DocParseError('cfb_not_word: ...') for valid CFB files that
    are not Word documents (e.g. .xls) — callers route those to the
    unsupported quarantine, matching the reference's extension
    deny-list (process_run.py:35-37).
    """
    streams = _cfb_streams(payload)
    word = streams.get("WordDocument")
    if word is None:
        raise DocParseError(
            "cfb_not_word: no WordDocument stream "
            f"(streams: {sorted(streams)[:4]})")
    if len(word) < 0x01AA or _u16(word, 0) != _FIB_WIDENT:
        raise DocParseError("doc: bad FIB (wIdent)")
    table_name = "1Table" if _u16(word, _OFF_FLAGS) & 0x0200 else "0Table"
    table = streams.get(table_name)
    if table is None:
        raise DocParseError(f"doc: missing {table_name} stream")
    ccp_text = _u32(word, _OFF_CCPTEXT)
    fc_clx, lcb_clx = _u32(word, _OFF_FCCLX), _u32(word, _OFF_LCBCLX)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(table):
        raise DocParseError("doc: CLX out of table-stream bounds")
    parts: list[str] = []
    for cp_start, cp_end, off, compressed in _pieces(
            table[fc_clx:fc_clx + lcb_clx]):
        if cp_start >= ccp_text:
            break  # footnotes/headers/annotations: past the main body
        n_cp = min(cp_end, ccp_text) - cp_start
        if compressed:
            chunk = word[off:off + n_cp]
            if len(chunk) != n_cp:
                raise DocParseError("doc: piece beyond WordDocument stream")
            parts.append(chunk.decode("cp1252", errors="replace"))
        else:
            chunk = word[off:off + 2 * n_cp]
            if len(chunk) != 2 * n_cp:
                raise DocParseError("doc: piece beyond WordDocument stream")
            parts.append(chunk.decode("utf-16-le", errors="replace"))
    return _normalize("".join(parts))


_SALVAGE_RUN_RE = re.compile(r"[\x20-\x7e\t\r]{8,}")


def doc_text_lenient(payload: bytes) -> str:
    """Salvage-mode .doc text: printable-ASCII runs (>= 8 chars) of
    the WordDocument stream, Word paragraph marks (\\r) normalized to
    newlines — the `strings(1)` approach, no FIB or piece table.

    Plays the reference's DOC->PDF second-chance role
    (pass_doc.py:105-186) when the strict piece-table parse scores
    below PASS_DOC_CUTOFF: any recoverable non-blank text is accepted
    with cutoff=0.0 semantics.  Scans the raw payload when the CFB
    container itself is unreadable; returns "" rather than raising.
    The 8-char minimum keeps isolated printable bytes inside FIB /
    directory / FAT structures out of the result (their UTF-16 names
    and packed integers never form 8 consecutive printable bytes).
    """
    try:
        data = _cfb_streams(payload).get("WordDocument") or payload
    except Exception:
        data = payload
    runs = _SALVAGE_RUN_RE.findall(data.decode("cp1252", errors="replace"))
    return _normalize("\n".join(r.replace("\r", "\n") for r in runs))


# --------------------------------------------------------------------------
# deterministic fixture writer
# --------------------------------------------------------------------------
def _build_word_stream(paragraphs: list[str],
                       split_pieces: bool) -> tuple[bytes, bytes]:
    """(WordDocument stream, 0Table stream) for the given paragraphs.

    Text is paragraphs joined with \\r (Word's paragraph mark). Each
    piece stores cp1252 when its text round-trips, else UTF-16LE —
    exercising both PCD encodings. split_pieces stores the text as
    two pieces (a real piece table, n >= 2).
    """
    text = "\r".join(paragraphs)
    halves = ([text[: len(text) // 2], text[len(text) // 2:]]
              if split_pieces and len(text) >= 2 else [text])
    halves = [h for h in halves if h]

    fib = bytearray(1472)
    struct.pack_into("<H", fib, 0, _FIB_WIDENT)
    struct.pack_into("<H", fib, 2, 0x00C1)          # nFib: Word 97
    struct.pack_into("<H", fib, _OFF_FLAGS, 0)      # 0Table
    struct.pack_into("<I", fib, _OFF_CCPTEXT, len(text))

    body = bytearray()
    pieces = []  # (cp_start, cp_end, fc_field)
    cp = 0
    for h in halves:
        try:
            enc, compressed = h.encode("cp1252"), True
            if enc.decode("cp1252") != h:
                raise UnicodeError
        except (UnicodeError, UnicodeEncodeError):
            enc, compressed = h.encode("utf-16-le"), False
        off = len(fib) + len(body)
        fc = (off * 2) | 0x40000000 if compressed else off
        pieces.append((cp, cp + len(h), fc))
        body.extend(enc)
        cp += len(h)

    n = len(pieces)
    plc = bytearray()
    for cps, _cpe, _fc in pieces:
        plc += struct.pack("<I", cps)
    plc += struct.pack("<I", cp)
    for _cps, _cpe, fc in pieces:
        plc += struct.pack("<HIH", 0, fc, 0)
    # a Prc block in front exercises the reader's RgPrc skip
    clx = b"\x01" + struct.pack("<H", 4) + b"\x00\x00\x00\x00"
    clx += b"\x02" + struct.pack("<I", len(plc)) + bytes(plc)

    struct.pack_into("<I", fib, _OFF_FCCLX, 0)
    struct.pack_into("<I", fib, _OFF_LCBCLX, len(clx))
    assert n >= 1
    return bytes(fib) + bytes(body), bytes(clx)


def build_doc(paragraphs: list[str], split_pieces: bool = False) -> bytes:
    """Deterministic minimal .doc builder (test fixtures / corpus):
    a spec-shaped CFB (v3, 512-byte sectors, miniFAT for streams
    under 4096 bytes) holding WordDocument + 0Table. Same inputs ->
    identical bytes."""
    word, table = _build_word_stream(paragraphs, split_pieces)
    return _build_cfb([("WordDocument", word), ("0Table", table)])


def _build_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    ssz, msz, cutoff = 512, 64, 4096

    # partition into mini and regular stream storage
    mini_payload = bytearray()
    mini_chains: dict[str, int] = {}   # name -> first mini sector
    minifat: list[int] = []
    for name, data in streams:
        if len(data) < cutoff:
            first = len(minifat)
            n_chunks = max(1, -(-len(data) // msz))
            for i in range(n_chunks):
                minifat.append(first + i + 1 if i + 1 < n_chunks
                               else _ENDOFCHAIN)
            mini_chains[name] = first
            mini_payload.extend(data)
            pad = (-len(data)) % msz
            mini_payload.extend(bytes(pad))

    # regular sector plan: [FAT][dir][miniFAT][ministream...][big...]
    def n_sect(nbytes: int) -> int:
        return max(1, -(-nbytes // ssz))

    dir_sectors = n_sect(128 * (1 + len(streams)))
    minifat_sectors = n_sect(4 * len(minifat)) if minifat else 0
    ministream_sectors = n_sect(len(mini_payload)) if mini_payload else 0
    big = [(name, data) for name, data in streams if len(data) >= cutoff]
    big_sectors = {name: n_sect(len(data)) for name, data in big}

    total_data = (dir_sectors + minifat_sectors + ministream_sectors
                  + sum(big_sectors.values()))
    fat_sectors = max(1, -(-(total_data + 1) // (ssz // 4)))
    assert fat_sectors <= 109, "fixture CFB exceeds header DIFAT"

    fat = [_FREESECT] * ((fat_sectors + total_data))
    sid = 0
    for _ in range(fat_sectors):
        fat[sid] = _FATSECT
        sid += 1

    def alloc(n: int) -> int:
        nonlocal sid
        first = sid
        for i in range(n):
            fat[sid] = sid + 1 if i + 1 < n else _ENDOFCHAIN
            sid += 1
        return first

    first_dir = alloc(dir_sectors)
    first_minifat = alloc(minifat_sectors) if minifat_sectors else _ENDOFCHAIN
    first_mini = (alloc(ministream_sectors)
                  if ministream_sectors else _ENDOFCHAIN)
    big_first = {name: alloc(big_sectors[name]) for name, _ in big}

    def dir_entry(name: str, etype: int, start: int, size: int,
                  child: int = _FREESECT) -> bytes:
        ent = bytearray(128)
        enc = name.encode("utf-16-le")
        ent[: len(enc)] = enc
        struct.pack_into("<H", ent, 0x40, len(enc) + 2)
        ent[0x42] = etype
        ent[0x43] = 1  # black
        struct.pack_into("<I", ent, 0x44, _FREESECT)  # left
        struct.pack_into("<I", ent, 0x48, _FREESECT)  # right
        struct.pack_into("<I", ent, 0x4C, child)
        struct.pack_into("<I", ent, 0x74, start)
        struct.pack_into("<I", ent, 0x78, size)
        return bytes(ent)

    entries = [dir_entry("Root Entry", 5, first_mini, len(mini_payload),
                         child=1)]
    for name, data in streams:
        start = (mini_chains[name] if len(data) < cutoff
                 else big_first[name])
        entries.append(dir_entry(name, 2, start, len(data)))
    dir_raw = b"".join(entries)
    dir_raw += bytes(dir_sectors * ssz - len(dir_raw))

    minifat_raw = b"".join(struct.pack("<I", v) for v in minifat)
    minifat_raw += bytes(
        minifat_sectors * ssz - len(minifat_raw)) if minifat_sectors else b""
    mini_raw = bytes(mini_payload)
    mini_raw += bytes(ministream_sectors * ssz - len(mini_raw))

    header = bytearray(512)
    header[:8] = _CFB_MAGIC
    struct.pack_into("<H", header, 0x18, 0x003E)   # minor
    struct.pack_into("<H", header, 0x1A, 0x0003)   # major: v3
    struct.pack_into("<H", header, 0x1C, 0xFFFE)   # little-endian
    struct.pack_into("<H", header, 0x1E, 9)        # 512-byte sectors
    struct.pack_into("<H", header, 0x20, 6)        # 64-byte mini
    struct.pack_into("<I", header, 0x2C, fat_sectors)
    struct.pack_into("<I", header, 0x30, first_dir)
    struct.pack_into("<I", header, 0x38, cutoff)
    struct.pack_into("<I", header, 0x3C, first_minifat)
    struct.pack_into("<I", header, 0x40, minifat_sectors)
    struct.pack_into("<I", header, 0x44, _ENDOFCHAIN)  # no extended DIFAT
    struct.pack_into("<I", header, 0x48, 0)
    for i in range(109):
        struct.pack_into("<I", header, 0x4C + 4 * i,
                         i if i < fat_sectors else _FREESECT)

    fat_raw = b"".join(struct.pack("<I", v) for v in fat)
    fat_raw += bytes(fat_sectors * ssz - len(fat_raw))

    body = bytearray()
    body += fat_raw + dir_raw + minifat_raw + mini_raw
    for name, data in big:
        padded = data + bytes(big_sectors[name] * ssz - len(data))
        body += padded
    return bytes(header) + bytes(body)

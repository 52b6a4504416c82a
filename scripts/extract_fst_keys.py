#!/usr/bin/env python3
"""Offline extraction of the key set from a BurntSushi `fst` crate v3 Set
file (the format of charabia/dictionaries/fst/*/words.fst).

Used once to recover the Khmer word list (which, unlike Thai/German, ships
only as an FST). Validated against thai/words.fst whose plaintext word list
is known: `python scripts/extract_fst_keys.py validate`.

Format notes (public, from the fst crate's raw node layout): nodes are
written back-to-front; an address points at a node's state byte (its last
byte). State kinds by the top two bits: 0b11 OneTransNext, 0b10 OneTrans,
else AnyTrans (0b01 bit = final flag, low 6 bits = ntrans). Common input
bytes are indexed through a frequency table; transition addresses are packed
little-endian deltas relative to the end of the node.
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

# Inverse of the fst crate's COMMON_INPUTS table (byte frequencies from a
# URL corpus — note '/' at index 3). Recovered empirically with zero
# conflicts by parallel-walking the German and Thai FSTs against their known
# plaintext word lists; indices never observed raise loudly if encountered.
COMMON_INPUTS_INV = {
    1: "t", 2: "e", 3: "/", 4: "o", 5: "a", 6: "s", 7: "r", 8: "i",
    9: "p", 10: "c", 11: "n", 12: "w", 13: ".", 14: "h", 15: "l",
    16: "m", 17: "-", 18: "d", 19: "u", 20: "0", 21: "1", 23: "g",
    26: "b", 27: "f", 29: "y", 33: "4", 34: "v", 35: "9", 39: "k",
    42: "x", 51: "j", 54: "z", 61: "q",
}


def common_input(idx: int) -> int:
    if idx not in COMMON_INPUTS_INV:
        raise KeyError(f"common input index {idx} not recovered")
    return ord(COMMON_INPUTS_INV[idx])


def unpack_uint(data: bytes, start: int, nbytes: int) -> int:
    return int.from_bytes(data[start : start + nbytes], "little")


class FstReader:
    def __init__(self, data: bytes):
        self.data = data
        version = struct.unpack("<Q", data[:8])[0]
        assert version == 3, f"unsupported fst version {version}"
        self.len = struct.unpack("<Q", data[-20:-12])[0]
        self.root_addr = struct.unpack("<Q", data[-12:-4])[0]

    def node(self, addr: int):
        """Returns (is_final, [(input_byte, target_addr), ...])."""
        data = self.data
        if addr == 0:  # EMPTY_ADDRESS: the empty final node
            return True, []
        state = data[addr]
        kind = state >> 6
        if kind == 0b11:  # OneTransNext
            low = state & 0x3F
            if low == 0:
                inp = data[addr - 1]
                node_len = 2
            else:
                inp = common_input(low)
                node_len = 1
            return False, [(inp, addr - node_len)]
        if kind == 0b10:  # OneTrans
            low = state & 0x3F
            pos = addr - 1
            if low == 0:
                inp = data[pos]
                pos -= 1
            else:
                inp = common_input(low)
            pack = data[pos]
            ta = pack >> 4
            os_ = pack & 0x0F
            pos -= 1
            delta = unpack_uint(data, pos - ta + 1, ta)
            # delta is relative to the byte count written before this node
            # (= this node's first byte index)
            node_start = pos - ta - os_ + 1
            target = 0 if delta == 0 else node_start - delta
            return False, [(inp, target)]
        # AnyTrans
        is_final = bool(state & 0x40)
        ntrans = state & 0x3F
        pos = addr - 1
        if ntrans == 0:
            ntrans = data[pos]
            if ntrans == 1:
                # could be 256 (1 is impossible here; 1-trans nodes use
                # OneTrans states) — the crate stores 256 as 1
                ntrans = 256
            pos -= 1
        pack = data[pos]
        ta = pack >> 4
        os_ = pack & 0x0F
        pos -= 1
        # a sparse 256-byte input index may precede the inputs (written for
        # larger nodes); detect it empirically: the non-0xFF positions of a
        # real index are exactly the input byte values that follow it.
        if pos >= 256 + ntrans:
            cand = data[pos - 255 : pos + 1]
            cand_inputs = set(data[pos - 256 - ntrans + 1 : pos - 256 + 1])
            for orient in (lambda i: 255 - i, lambda i: i):
                nonff = {orient(i) for i, v in enumerate(cand) if v != 0xFF}
                if len(nonff) == ntrans and nonff == cand_inputs:
                    pos -= 256
                    break
        # inputs: ntrans bytes, stored reversed (input i at pos - i)
        inputs = data[pos - ntrans + 1 : pos + 1][::-1]
        pos -= ntrans
        # transition addrs: ntrans * ta bytes, reversed per transition;
        # deltas are relative to this node's first byte index
        node_start = pos - ntrans * ta - ntrans * os_ + 1
        if is_final and os_:
            node_start -= os_  # final output slot
        trans = []
        for i in range(ntrans):
            start = pos - (i + 1) * ta + 1
            delta = unpack_uint(data, start, ta)
            target = 0 if delta == 0 else node_start - delta
            trans.append((inputs[i], target))
        return is_final, trans

    def keys(self):
        out = []
        stack = [(self.root_addr, b"")]
        # iterative DFS preserving lexicographic-ish order (not required)
        while stack:
            addr, prefix = stack.pop()
            is_final, trans = self.node(addr)
            if is_final:
                out.append(prefix)
            for inp, target in reversed(trans):
                stack.append((target, prefix + bytes([inp])))
        return out


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "validate"
    ref = Path("/root/reference/charabia/dictionaries")
    if mode == "validate":
        data = (ref / "fst/thai/words.fst").read_bytes()
        keys = {k.decode("utf-8", "replace") for k in FstReader(data).keys()}
        truth = set((ref / "txt/thai/words.txt").read_text().split("\n"))
        truth.discard("")
        print(f"extracted {len(keys)}, truth {len(truth)}")
        missing = truth - keys
        extra = keys - truth
        print(f"missing {len(missing)}, extra {len(extra)}")
        if missing:
            print("missing sample:", sorted(missing)[:5])
        if extra:
            print("extra sample:", sorted(extra)[:5])
        return 0 if not missing and not extra else 1
    if mode == "khmer":
        data = (ref / "fst/khmer/words.fst").read_bytes()
        keys = sorted(k.decode("utf-8") for k in FstReader(data).keys())
        out = Path(__file__).resolve().parent.parent / "sparkft/data/khmer_words.txt"
        out.write_text("\n".join(keys))
        print(f"wrote {len(keys)} khmer words to {out}")
        return 0
    print("usage: extract_fst_keys.py [validate|khmer]")
    return 2


if __name__ == "__main__":
    sys.exit(main())

"""SPM and byte-level BPE tokenizers (llama.cpp-compatible).

Algorithms follow the reference sessions in src/llama-vocab.cpp: SPM is the
score-greedy bigram merge with byte fallback (:110-279), BPE is rank-greedy
pair merging over GPT-2 byte-encoded pre-tokenized words (:279-470), and
special tokens are partitioned out of the raw text first, longest-first
(tokenizer_st_partition :2916). Verified against the reference's vocab
fixtures (models/ggml-vocab-*.gguf{,.inp,.out}).
"""
from __future__ import annotations

import heapq
from dataclasses import dataclass

from ..gguf.reader import GGUFFile
from .pretokenizers import get_pre_regexes, regex_split
from .vocab import TokenAttr, Vocab


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2 byte -> printable unicode char map."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_BYTE_ENC = _bytes_to_unicode()
_BYTE_DEC = {v: k for k, v in _BYTE_ENC.items()}


class Tokenizer:
    """Facade dispatching on vocab.model; covers SPM + BPE + WPM + UGM +
    RWKV (byte trie)."""

    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        if vocab.model == "llama":
            self._session = _SPM(vocab)
        elif vocab.model == "gpt2":
            self._session = _BPE(vocab)
        elif vocab.model == "bert":
            self._session = _WPM(vocab)
        elif vocab.model == "t5":
            self._session = _UGM(vocab)
        elif vocab.model == "rwkv":
            self._session = _RWKV(vocab)
        elif vocab.model == "plamo2":
            self._session = _PLAMO2(vocab)
        else:
            raise NotImplementedError(f"tokenizer model {vocab.model!r}")

    @classmethod
    def from_gguf(cls, g: GGUFFile | str) -> "Tokenizer":
        if isinstance(g, str):
            g = GGUFFile(g)
        return cls(Vocab.from_gguf(g))

    # -- special-token partition (llama-vocab.cpp:2916) --

    def _partition(self, text: str, parse_special: bool):
        """-> list of ("text", str) | ("token", id) fragments."""
        frags: list[tuple[str, object]] = [("text", text)] if text else []
        v = self.vocab
        for sid in v.special_tokens:
            attr = v.attrs[sid]
            if not parse_special and (attr & (TokenAttr.CONTROL | TokenAttr.UNKNOWN)):
                continue
            stext = v.tokens[sid]
            out: list[tuple[str, object]] = []
            for kind, val in frags:
                if kind != "text":
                    out.append((kind, val))
                    continue
                rest = val
                while True:
                    i = rest.find(stext)
                    if i < 0:
                        if rest:
                            out.append(("text", rest))
                        break
                    left = rest[:i]
                    if attr & TokenAttr.LSTRIP:
                        left = left.rstrip()
                    if left:
                        out.append(("text", left))
                    out.append(("token", sid))
                    rest = rest[i + len(stext):]
                    if attr & TokenAttr.RSTRIP:
                        rest = rest.lstrip()
            frags = out
        return frags

    def encode(self, text: str, add_special: bool = True, parse_special: bool = False) -> list[int]:
        v = self.vocab
        out: list[int] = []
        frags = self._partition(text, parse_special)
        if isinstance(self._session, _SPM):
            prev_special = True
            if add_special and v.add_bos and v.bos_id is not None:
                out.append(v.bos_id)
            for kind, val in frags:
                if kind == "text":
                    t = (" " if (v.add_space_prefix and prev_special) else "") + val
                    self._session.tokenize(t.replace(" ", "▁"), out)
                    prev_special = False
                else:
                    out.append(val)
                    prev_special = True
            if add_special and v.add_eos and v.eos_id is not None:
                out.append(v.eos_id)
        elif isinstance(self._session, _WPM):
            cls_ = v.cls_id if v.cls_id is not None else v.bos_id
            sep = v.sep_id if v.sep_id is not None else v.eos_id
            if add_special and cls_ is not None:
                out.append(cls_)
            for kind, val in frags:
                if kind == "text":
                    self._session.tokenize(val, out)
                else:
                    out.append(val)
            if add_special and sep is not None:
                out.append(sep)
        else:
            if add_special and v.add_bos and v.bos_id is not None:
                out.append(v.bos_id)
            for kind, val in frags:
                if kind == "text":
                    self._session.tokenize(val, out)
                else:
                    out.append(val)
            if add_special and v.add_eos and v.eos_id is not None:
                out.append(v.eos_id)
        return out

    def decode(self, ids: list[int], skip_special: bool = False) -> str:
        v = self.vocab
        if isinstance(self._session, _WPM):
            buf = []
            for i in ids:
                a = v.attrs[i]
                if (a & TokenAttr.CONTROL) or (a & TokenAttr.UNKNOWN):
                    if not skip_special:
                        buf.append(v.tokens[i])
                    continue
                buf.append(v.tokens[i].replace("▁", " "))
            s = "".join(buf)
            return s[1:] if s.startswith(" ") else s
        if isinstance(self._session, _RWKV):
            buf = bytearray()
            for i in ids:
                a = v.attrs[i]
                if skip_special and (a & TokenAttr.CONTROL):
                    continue
                buf += _rwkv_unescape(v.tokens[i])
            return buf.decode("utf-8", errors="replace")
        if isinstance(self._session, _PLAMO2):
            # plain text pieces; byte tokens are raw bytes
            # (token_to_piece PLAMO2 case, src/llama-vocab.cpp:3366)
            buf = bytearray()
            for i in ids:
                a = v.attrs[i]
                if a & TokenAttr.BYTE:
                    buf += bytes([int(v.tokens[i][3:5], 16)])
                elif a & (TokenAttr.CONTROL | TokenAttr.UNKNOWN):
                    if not skip_special:
                        buf += v.tokens[i].encode()
                else:
                    buf += v.tokens[i].encode()
            return buf.decode("utf-8", errors="replace")
        if isinstance(self._session, (_SPM, _UGM)):  # SPM-style pieces
            buf = bytearray()
            for i in ids:
                a = v.attrs[i]
                if skip_special and (a & TokenAttr.CONTROL):
                    continue
                if a & TokenAttr.BYTE:
                    buf += bytes([int(v.tokens[i][3:5], 16)])
                elif a & TokenAttr.CONTROL or a & TokenAttr.UNKNOWN:
                    if not skip_special:
                        buf += v.tokens[i].encode()
                else:
                    buf += v.tokens[i].replace("▁", " ").encode()
            s = buf.decode("utf-8", errors="replace")
            return s[1:] if s.startswith(" ") and v.add_space_prefix else s
        parts = []
        for i in ids:
            a = v.attrs[i]
            if a & (TokenAttr.CONTROL | TokenAttr.USER_DEFINED | TokenAttr.UNKNOWN):
                if not skip_special:
                    parts.append(v.tokens[i].encode())
            else:
                parts.append(bytes(_BYTE_DEC[c] for c in v.tokens[i]))
        return b"".join(parts).decode("utf-8", errors="replace")


class _SPM:
    """Score-greedy bigram merge (llm_tokenizer_spm, llama-vocab.cpp:110)."""

    def __init__(self, vocab: Vocab):
        self.v = vocab

    def tokenize(self, text: str, out: list[int]) -> None:
        v = self.v
        if not text:
            return
        syms = list(text)  # unicode chars
        # (neg_score, left_index, seq) heap; lazy deletion via size checks
        nxt = list(range(1, len(syms))) + [-1]
        prv = [-1] + list(range(len(syms) - 1))
        alive = [True] * len(syms)
        rev_merge: dict[str, tuple[str, str]] = {}
        heap: list[tuple[float, int, str]] = []

        def try_add(li: int):
            ri = nxt[li]
            if li < 0 or ri < 0:
                return
            pair = syms[li] + syms[ri]
            tid = v.token_to_id.get(pair)
            if tid is None or v.attrs[tid] & (TokenAttr.UNUSED | TokenAttr.BYTE):
                return
            score = float(v.scores[tid]) if v.scores is not None else 0.0
            heapq.heappush(heap, (-score, li, pair))

        for i in range(len(syms) - 1):
            try_add(i)

        while heap:
            negs, li, pair = heapq.heappop(heap)
            ri = nxt[li] if li >= 0 else -1
            if li < 0 or ri < 0 or not alive[li] or not alive[ri]:
                continue
            if syms[li] + syms[ri] != pair:
                continue  # stale entry
            rev_merge[pair] = (syms[li], syms[ri])
            syms[li] = pair
            alive[ri] = False
            nxt[li] = nxt[ri]
            if nxt[ri] >= 0:
                prv[nxt[ri]] = li
            try_add(li)
            if prv[li] >= 0:
                try_add(prv[li])

        def resegment(s: str):
            tid = v.token_to_id.get(s)
            if tid is not None and not (v.attrs[tid] & TokenAttr.UNUSED):
                out.append(tid)
                return
            if s in rev_merge:
                l, r = rev_merge[s]
                resegment(l)
                resegment(r)
                return
            for b in s.encode("utf-8"):
                try:
                    out.append(v.byte_to_id(b))
                except KeyError:
                    if v.unk_id is not None:
                        out.append(v.unk_id)

        i = 0
        while i >= 0 and i < len(syms):
            if alive[i]:
                resegment(syms[i])
            i = nxt[i]


class _WPM:
    """BERT WordPiece (llm_tokenizer_wpm, llama-vocab.cpp:735-841).

    The GGUF stores pieces SPM-style ('hello' -> '▁hello', '##lo' -> 'lo'),
    so each word gets a phantom '▁' prepended and matching is plain greedy
    longest-substring over the vocab — no '##' handling at runtime.
    Preprocess: per-codepoint NFD-to-base (approximated here as NFD + drop
    combining marks), drop controls/U+0000/U+FFFD, lowercase, split words on
    whitespace and make single-char words from punctuation, ASCII symbols,
    and CJK chars. A word with any unmatchable position becomes one UNK."""

    def __init__(self, vocab: Vocab):
        self.v = vocab
        self._max_len = max((len(t) for t in vocab.tokens), default=1)

    @staticmethod
    def _is_cjk(cp: int) -> bool:
        return (0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
                or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
                or 0x2B740 <= cp <= 0x2B81F or 0x2B920 <= cp <= 0x2CEAF
                or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F)

    def _preprocess(self, text: str) -> list[str]:
        import unicodedata

        words: list[str] = []
        cur = ""
        for ch in unicodedata.normalize("NFD", text):
            cat = unicodedata.category(ch)
            if cat == "Mn":  # base-only NFD: drop the decomposed marks
                continue
            if ch.isspace():
                if cur:
                    words.append(cur)
                cur = ""
                continue
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or cat.startswith("C"):
                continue
            low = ch.lower()
            if cat.startswith("P") or (cp < 0x7F and cat.startswith("S")) \
                    or self._is_cjk(cp):
                if cur:
                    words.append(cur)
                cur = ""
                words.append(low)
            else:
                cur += low
        if cur:
            words.append(cur)
        return words

    def tokenize(self, text: str, out: list[int]) -> None:
        v = self.v
        maxlen = self._max_len
        for word in self._preprocess(text):
            if not word:
                continue
            w = "▁" + word  # phantom space prefix
            n = len(w)
            start = len(out)
            i = 0
            while i < n:
                matched = False
                for j in range(min(n, i + maxlen), i, -1):
                    tid = v.token_to_id.get(w[i:j])
                    if tid is not None:
                        out.append(tid)
                        i = j
                        matched = True
                        break
                if not matched:  # discard partial word
                    del out[start:]
                    break
            if len(out) == start and v.unk_id is not None:
                out.append(v.unk_id)


# pre types whose tokenizers set ignore_merges: a whole word already in the
# vocab is emitted directly without running merges (llama-vocab.cpp:585 +
# the per-pre flags at :1969,1987,2077)
_IGNORE_MERGES_PRES = frozenset({
    "llama3", "llama-v3", "llama-bpe", "falcon3", "falcon-h1", "pixtral",
    "midm-2.0", "lfm2", "jina-v5-nano", "youtu", "tekken",
})


class _BPE:
    """Rank-greedy byte-level BPE (llm_tokenizer_bpe, llama-vocab.cpp:279)."""

    def __init__(self, vocab: Vocab):
        self.v = vocab
        self.ranks = {tuple(m.split(" ", 1)): r for r, m in enumerate(vocab.merges)}
        self.patterns = get_pre_regexes(vocab.pre)
        self.ignore_merges = vocab.pre in _IGNORE_MERGES_PRES

    def tokenize(self, text: str, out: list[int]) -> None:
        v = self.v
        for word in regex_split(text, self.patterns):
            enc = "".join(_BYTE_ENC[b] for b in word.encode("utf-8"))
            if self.ignore_merges:
                tid = v.token_to_id.get(enc)
                if tid is not None:
                    out.append(tid)
                    continue
            parts = self._merge(enc)
            for p in parts:
                tid = v.token_to_id.get(p)
                if tid is not None:
                    out.append(tid)
                else:
                    for ch in p:
                        tid = v.token_to_id.get(ch)
                        if tid is not None:
                            out.append(tid)

    def _merge(self, word: str) -> list[str]:
        parts = list(word)
        if len(parts) < 2:
            return parts
        while True:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_i < 0:
                break
            parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
        return parts


class _UGM:
    """SentencePiece unigram Viterbi (llm_tokenizer_ugm, llama-vocab.cpp:847).

    Normalization: user-defined tokens pass through verbatim; the
    precompiled charsmap's XOR-compressed double array maps input prefixes
    to replacement strings; spaces escape to U+2581 with the prepend/merge
    rules. Tokenization: optimized Viterbi over UTF-8 code points with
    unknown-token penalty = min_score - 10 and consecutive-unknown merging
    — reproducing the reference byte-for-byte (double-precision sums)."""

    def __init__(self, vocab: Vocab):
        self.v = vocab
        self.tok: dict[bytes, tuple[int, float]] = {}
        self.max_len = 1
        min_score = float("inf")
        user_defined: list[bytes] = []
        for i, t in enumerate(vocab.tokens):
            a = vocab.attrs[i]
            if a & (TokenAttr.NORMAL | TokenAttr.USER_DEFINED | TokenAttr.UNUSED):
                b = t.encode("utf-8")
                score = 0.0 if (a & TokenAttr.USER_DEFINED) else float(
                    vocab.scores[i] if vocab.scores is not None and
                    i < len(vocab.scores) else 0.0)
                self.tok[b] = (i, score)
                self.max_len = max(self.max_len, len(b))
            if a & TokenAttr.NORMAL and vocab.scores is not None:
                min_score = min(min_score, float(vocab.scores[i]))
            if a & TokenAttr.USER_DEFINED:
                user_defined.append(t.encode("utf-8"))
        self.unknown_score = (min_score if min_score != float("inf")
                              else 0.0) - 10.0
        self.user_defined = sorted(user_defined, key=len, reverse=True)
        # precompiled charsmap: u32 xcda blob size | xcda u32[] | repls \0-sep
        self.xcda = None
        self.repls = b""
        pc = vocab.precompiled_charsmap
        if pc:
            import numpy as np

            n = int.from_bytes(pc[:4], "little")
            self.xcda = np.frombuffer(pc[4:4 + n], np.uint32)
            self.repls = pc[4 + n:]

    # --- XCDA view (xcda_array_view, llama-vocab.cpp:1080) ---------------

    def _node(self, i):
        if i >= len(self.xcda):
            raise IndexError
        return int(self.xcda[i])

    def _base(self, i):
        p = self._node(i)
        return (p >> 10) << ((p & (1 << 9)) >> 6)

    def _lcheck(self, i):
        p = self._node(i)
        return p & ((1 << 31) | 0xFF)

    def _leaf(self, i):
        return bool((self._node(i) >> 8) & 1)

    def _value(self, i):
        return self._node(i) & ((1 << 31) - 1)

    def _utf8_len(self, b0: int) -> int:
        if b0 < 0x80:
            return 1
        if b0 >> 5 == 0b110:
            return 2
        if b0 >> 4 == 0b1110:
            return 3
        if b0 >> 3 == 0b11110:
            return 4
        return 1

    def _normalize_prefix(self, data: bytes, off: int):
        """-> (replacement bytes, consumed input bytes)."""
        for ud in self.user_defined:
            if data.startswith(ud, off):
                return data[off:off + len(ud)], len(ud)
        if self.xcda is not None and len(self.xcda):
            longest_len = 0
            longest_off = 0
            try:
                node = self._base(0)
                for p in range(off, len(data)):
                    c = data[p]
                    if c == 0:
                        break
                    node ^= c
                    if self._lcheck(node) != c:
                        break
                    is_leaf = self._leaf(node)
                    node ^= self._base(node)
                    if is_leaf:
                        longest_len = p - off + 1
                        longest_off = self._value(node)
            except IndexError:
                pass
            if longest_len:
                end = self.repls.index(b"\0", longest_off)
                return self.repls[longest_off:end], longest_len
        n = min(self._utf8_len(data[off]), len(data) - off)
        chunk = data[off:off + n]
        try:
            chunk.decode("utf-8")
            return chunk, n
        except UnicodeDecodeError:
            return b"\xef\xbf\xbd", 1
    def _normalize(self, text: str) -> bytes:
        v = self.v
        data = text.encode("utf-8")
        space = "▁".encode("utf-8") if v.escape_whitespaces else b" "
        prepend = v.add_space_prefix and not v.treat_whitespace_as_suffix
        append = v.add_space_prefix and v.treat_whitespace_as_suffix
        merge = v.remove_extra_whitespaces
        out = bytearray()
        space_prepended = False
        non_ws = False
        off = 0
        while off < len(data):
            repl, consumed = self._normalize_prefix(data, off)
            for c in repl:
                if c != 0x20:
                    if not non_ws:
                        non_ws = True
                        if (prepend and not space_prepended) or merge:
                            out += space
                            space_prepended = True
                    out.append(c)
                else:
                    if non_ws:
                        non_ws = False
                    if not merge:
                        out += space
            off += consumed
        if append:
            out += space
        return bytes(out)

    def tokenize(self, text: str, out_list: list) -> None:
        v = self.v
        data = self._normalize(text)
        n = len(data)
        if n == 0:
            return
        unk = v.unk_id if v.unk_id is not None else 0
        NEG = float("-inf")
        # (token_id, input_offset, score_sum) per end position
        best = [(unk, 0, NEG)] * (n + 1)
        best[0] = (unk, 0, 0.0)
        off = 0
        while off < n:
            ncp = min(self._utf8_len(data[off]), n - off)
            cur = best[off]
            single_cp = False
            lim = min(off + self.max_len, n)
            for end in range(off + 1, lim + 1):
                hit = self.tok.get(data[off:end])
                if hit is None:
                    continue
                if end - off == ncp:
                    single_cp = True
                tid, score = hit
                cand = cur[2] + score
                if cand > best[end][2]:
                    best[end] = (tid, off, cand)
            if not single_cp:
                cand = cur[2] + self.unknown_score
                end = off + ncp
                if cand > best[end][2]:
                    best[end] = (unk, off, cand)
            off += ncp
        out: list[int] = []
        pos = n
        prev_unk = False
        while True:
            tid, src, _ = best[pos]
            is_unk = tid == unk
            if not (prev_unk and is_unk):
                out.append(tid)
            if src == 0:
                break
            prev_unk = is_unk
            pos = src
        out.reverse()
        out_list.extend(out)


def _rwkv_unescape(text: str) -> bytes:
    """RWKV vocab strings escape raw bytes as \\t \\n \\r \\xNN \\\\
    (llama_unescape_rwkv_token, src/llama-vocab.cpp:1197)."""
    out = bytearray()
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c == "\\" and i + 1 < n:
            e = text[i + 1]
            if e == "t":
                out.append(9)
            elif e == "n":
                out.append(10)
            elif e == "r":
                out.append(13)
            elif e == "x" and i + 3 < n:
                out.append(int(text[i + 2: i + 4], 16))
                i += 4
                continue
            else:
                out += e.encode("utf-8")
            i += 2
        else:
            out += c.encode("utf-8")
            i += 1
    return bytes(out)


class _RWKV:
    """RWKV World tokenizer: greedy longest-match over a byte trie built
    from the unescaped vocab (llm_tokenizer_rwkv, src/llama-vocab.cpp:1251
    + the _session loop at :1267). Arbitrary byte tokens are supported —
    matching runs on the UTF-8 bytes of the input."""

    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.trie: dict = {}
        for tid, text in enumerate(vocab.tokens):
            b = _rwkv_unescape(text)
            if not b:
                continue
            node = self.trie
            for byte in b:
                node = node.setdefault(byte, {})
            node[-1] = tid  # -1 marks "token ends here"

    def tokenize(self, text: str, out: list) -> None:
        data = text.encode("utf-8")
        n = len(data)
        unk = self.vocab.unk_id if self.vocab.unk_id is not None else 0
        pos = 0
        while pos < n:
            node = self.trie.get(data[pos])
            if node is None:
                out.append(unk)
                pos += 1
                continue
            tid, end = None, pos + 1
            p = pos + 1
            while node is not None:
                if -1 in node:
                    tid, end = node[-1], p
                node = node.get(data[p]) if p < n else None
                p += 1
            if tid is None:  # trie path exists but no token ends on it
                out.append(unk)
                pos += 1
            else:
                out.append(tid)
                pos = end


class _PLAMO2:
    """PLaMo-2 tokenizer: Viterbi DP over codepoints with byte fallback
    (llm_tokenizer_plamo2, src/llama-vocab.cpp:1303-1568).

    The reference builds an Aho-Corasick suffix table whose net effect is:
    at every position, the candidate pieces are exactly the vocab tokens
    that prefix the remaining text, visited longest-first, followed by a
    one-codepoint byte-fallback sentinel. This re-derivation runs that DP
    directly off a piece dict — same integer score quantization
    (round(score*1e4)), same int64 min-DP with strict <, so tie-breaks
    (longest piece wins) are identical to the reference table walk."""

    UNKNOWN_SCORE = -10_000_000

    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.pieces: dict[str, tuple[int, int]] = {}
        self.maxlen = 1
        scores = vocab.scores
        for tid, text in enumerate(vocab.tokens):
            if vocab.attrs[tid] & TokenAttr.BYTE or not text:
                continue
            sc = float(scores[tid]) if scores is not None else 0.0
            v = sc * 1e4  # std::round: half away from zero (llama-vocab.cpp:1426)
            self.pieces[text] = (tid, int(v + 0.5) if v >= 0 else int(v - 0.5))
            self.maxlen = max(self.maxlen, len(text))

    def tokenize(self, text: str, out: list) -> None:
        if text and text[0] == "﻿":  # BOM skip (llama-vocab.cpp:1446)
            text = text[1:]
        n = len(text)
        if not n:
            return
        INF = 1 << 60
        scores = [INF] * (n + 1)
        scores[n] = 0
        path_len = [1] * (n + 1)
        path_tok = [-1] * (n + 1)
        pieces = self.pieces
        for i in range(n - 1, -1, -1):
            best = INF
            blen, btok = 1, -1
            lim = min(self.maxlen, n - i)
            # longest-first == the reference's decreasing piece_length rows
            for L in range(lim, 0, -1):
                hit = pieces.get(text[i: i + L])
                if hit is None:
                    continue
                s = scores[i + L] - hit[1]
                if s < best:
                    best, blen, btok = s, L, hit[0]
            s = scores[i + 1] - self.UNKNOWN_SCORE  # byte-fallback sentinel
            if s < best:
                best, blen, btok = s, 1, -1
            scores[i] = best
            path_len[i], path_tok[i] = blen, btok
        byt = self.vocab.byte_tokens
        pos = 0
        while pos < n:
            tid = path_tok[pos]
            if tid >= 0:
                out.append(tid)
            else:  # emit the codepoint's UTF-8 bytes as <0xXX> tokens
                for b in text[pos].encode("utf-8"):
                    out.append(byt[b])
            pos += path_len[pos]

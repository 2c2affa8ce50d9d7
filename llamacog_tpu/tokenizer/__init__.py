from .bpe import BpeTokenizer
from .spm import SpmTokenizer
from .vocab import TokenAttr, Vocab


def build_tokenizer(vocab: Vocab):
    """Tokenizer factory by vocab model family (llama.cpp vocab types)."""
    if vocab.model == "llama":
        return SpmTokenizer(vocab)
    if vocab.model == "gpt2":
        return BpeTokenizer(vocab)
    if vocab.model == "bert":
        from .wpm import WpmTokenizer

        return WpmTokenizer(vocab)
    if vocab.model == "t5":
        from .ugm import UgmTokenizer

        return UgmTokenizer(vocab)
    if vocab.model == "rwkv":
        from .rwkv import RwkvTokenizer

        return RwkvTokenizer(vocab)
    if vocab.model in ("none", "no_vocab"):
        raise ValueError("model has no vocab")
    raise NotImplementedError(f"tokenizer model {vocab.model!r}")


def tokenizer_from_metadata(metadata: dict):
    vocab = Vocab.from_metadata(metadata)
    return vocab, build_tokenizer(vocab)


__all__ = [
    "BpeTokenizer",
    "SpmTokenizer",
    "TokenAttr",
    "Vocab",
    "build_tokenizer",
    "tokenizer_from_metadata",
]

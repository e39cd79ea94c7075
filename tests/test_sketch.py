import numpy as np
import pytest
from conftest import data

from galah_tpu.sketch.kmers import canonical_kmers, decode_kmers, distinct_canonical_kmers
from galah_tpu.sketch.minhash import mash_ani, mash_jaccard, sketch_file, sketch_sequences
from galah_tpu.sketch.murmur3 import murmur3_x64_128


def test_murmur3_known_vectors():
    key = np.frombuffer(b"hello", dtype=np.uint8)[None, :]
    assert int(murmur3_x64_128(key)[0]) == 0xCBD8A7B341BD9B02
    key2 = np.frombuffer(
        b"The quick brown fox jumps over the lazy dog", dtype=np.uint8
    )[None, :]
    assert int(murmur3_x64_128(key2)[0]) == 0xE34BBC7BBC071B6C
    # 16-byte key exercises the block path with no tail
    key3 = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)[None, :]
    ref3 = murmur3_x64_128(key3)[0]
    assert murmur3_x64_128(np.vstack([key3, key3]))[1] == ref3


def test_canonical_kmers_basic():
    # revcomp(ACG) = CGT; canonical of ACG is min(ACG, CGT) = ACG
    km = canonical_kmers(b"ACG", 3)
    assert km.size == 1
    assert decode_kmers(km, 3).tobytes() == b"ACG"
    # revcomp(TTT) = AAA -> canonical AAA
    km = canonical_kmers(b"TTT", 3)
    assert decode_kmers(km, 3).tobytes() == b"AAA"


def test_canonical_kmers_skip_ambiguous():
    km = canonical_kmers(b"ACGTNACGT", 4)
    # positions 0..5; windows containing N (pos 1..4 overlap idx 4) dropped
    assert km.size == 2  # ACGT at 0 and at 5
    km2 = canonical_kmers(b"acgt", 4)  # lowercase accepted
    assert km2.size == 1


def test_canonical_strand_invariance():
    fwd = b"ACGTTGCAACGGTTACG"
    rc = b"CGTAACCGTTGCAACGT"
    a = np.sort(distinct_canonical_kmers([fwd], 5))
    b = np.sort(distinct_canonical_kmers([rc], 5))
    assert np.array_equal(a, b)


def test_finch_parity_golden():
    # Reference golden: ANI(1mbp, 500kb) == 0.9808188 (src/finch.rs:107-129)
    a = sketch_file(data("set1/1mbp.fna"))
    b = sketch_file(data("set1/500kb.fna"))
    ani = float(np.float32(mash_ani(a, b)))
    assert ani == pytest.approx(0.9808188, abs=1e-7)
    # and the same pair fails a 0.99 threshold (src/finch.rs:121-128)
    assert ani < 0.99


def test_mash_jaccard_identical():
    sk = sketch_sequences([b"ACGT" * 1000])
    assert mash_jaccard(sk, sk) == 1.0
    assert mash_ani(sk, sk) == 1.0

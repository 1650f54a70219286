"""Python port of graft.operators.Dedup kernels (Scala) for oracle-SQL validation."""
M64 = (1<<64) - 1

def hash64(s):
    h = 0xcbf29ce484222325
    for c in s:
        h ^= ord(c)
        h = (h * 0x100000001b3) & M64
    return h

def rotl64(x, k):
    return ((x << k) | (x >> (64 - k))) & M64

def tokens(text):
    import re
    return re.split(' +', text.strip().lower())

def shingle_hashes(text, n=3):
    th = [hash64(t) for t in tokens(text)]
    if len(th) >= n:
        out = []
        for g in range(len(th) - n + 1):
            acc = 0
            for k in range(n):
                acc ^= rotl64(th[g+k], (1 + 21*k) % 64)
            out.append(acc)
    else:
        acc = 0
        for x in th:
            acc = rotl64(acc, 5) ^ x
        out = [acc]
    return sorted(set(out))

P = 4294967311
def a_coef(i): return ((0x9E3779B9 * (i+1)) % 1073741789) | 1
def b_coef(i): return (0x85EBCA6B * (i+1) + 0x27D4EB2F) % 1073741789

def minhash_sig(sh, k=16):
    sig = []
    for i in range(k):
        a, b = a_coef(i), b_coef(i)
        sig.append(min(((a * (x & 0xFFFFFFFF) + b) % P) for x in sh))
    return sig

def simhash64(text):
    counts = [0]*64
    for t in tokens(text):
        h = hash64(t)
        for b in range(64):
            if (h >> b) & 1: counts[b] += 1
            else: counts[b] -= 1
    sig = 0
    for b in range(64):
        if counts[b] > 0: sig |= (1 << b)
    return sig  # unsigned; signed = sig - 2^64 if sig >= 2^63

"""Serialization: the reference's exact wire format.

(reference: native/src/seal/serialization.{h,cpp}, serializable.h,
ciphertext.cpp:170-290, plaintext.cpp:204-280, kswitchkeys.cpp:43-150,
encryptionparams.cpp:14-118, modulus.cpp save/load, intarray.h:592-640.)

Every object is framed by the 16-byte SEALHeader
{magic 0xA15E, header_size 0x10, version 3.5, compr_mode, reserved, size}
and optionally zlib-deflated (compr_mode 1).  Byte-level compatibility is
the interop anchor: objects serialized by the C++ reference load here and
vice versa.  Device tensors are pulled to host on save and re-uploaded on
load.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

from .ciphertext import Ciphertext, Plaintext
from .keys import GaloisKeys, KSwitchKeys, PublicKey, RelinKeys, SecretKey
from .modulus import Modulus
from .params import PARMS_ID_ZERO, EncryptionParameters, SchemeType
from .utils import native

__all__ = [
    "SerializableCiphertext",
    "SerializableKSwitchKeys",
    "COMPR_NONE",
    "COMPR_DEFLATE",
    "save",
    "load_parms",
    "load_modulus",
    "load_plaintext",
    "load_ciphertext",
    "load_secret_key",
    "load_public_key",
    "load_kswitch_keys",
    "load_relin_keys",
    "load_galois_keys",
]

SEAL_MAGIC = 0xA15E
HEADER_SIZE = 0x10
VERSION_MAJOR = 3
VERSION_MINOR = 5
COMPR_NONE = 0
COMPR_DEFLATE = 1

_HEADER_FMT = "<HBBBBHQ"


def _frame(payload: bytes, compr_mode: int) -> bytes:
    # native runtime path for deflate frames (gst_native.cpp gst_frame:
    # header + zlib, byte-identical); tiny uncompressed frames stay in
    # Python where struct.pack + concat beats an FFI round trip
    if compr_mode == COMPR_DEFLATE and native.available():
        framed = native.frame(payload, compr_mode)
        if framed is not None:
            return framed
    if compr_mode == COMPR_DEFLATE:
        payload = zlib.compress(payload)
    total = HEADER_SIZE + len(payload)
    header = struct.pack(
        _HEADER_FMT, SEAL_MAGIC, HEADER_SIZE, VERSION_MAJOR, VERSION_MINOR,
        compr_mode, 0, total,
    )
    return header + payload


def _unframe(data: bytes, offset: int = 0):
    """Returns (payload_bytes, total_size)."""
    if len(data) < offset + HEADER_SIZE:
        raise ValueError("loaded SEALHeader is invalid (truncated stream)")
    magic, hsize, _vmaj, _vmin, compr, _res, size = struct.unpack_from(
        _HEADER_FMT, data, offset
    )
    if magic != SEAL_MAGIC:
        raise ValueError("loaded SEALHeader is invalid (bad magic)")
    if hsize != HEADER_SIZE:
        if hsize == 0:
            # Legacy SEAL 3.4 header: {magic u16, zero u8, compr u8,
            # size u32, reserved u64} — same 16-byte footprint.  Mirror the
            # reference's upgrade path (serialization.cpp:137-165 /
            # serialization.h:305-334 legacy_headers::SEALHeader_3_4):
            # reinterpret the header, carry over compr_mode and size, and
            # load the members with the current readers.
            _m, _z, compr, size, _res = struct.unpack_from(
                "<HBBIQ", data, offset
            )
            if compr not in (COMPR_NONE, COMPR_DEFLATE):
                raise ValueError("unsupported compression mode (legacy header)")
            if compr == COMPR_DEFLATE:
                payload = zlib.decompress(data[offset + HEADER_SIZE : offset + size])
            else:
                payload = data[offset + HEADER_SIZE :]
            return payload, size
        raise ValueError("loaded SEALHeader is invalid (bad header size)")
    if compr == COMPR_DEFLATE:
        payload = zlib.decompress(data[offset + HEADER_SIZE : offset + size])
    elif compr == COMPR_NONE:
        # Stream semantics, like the reference's Load (its size check is
        # compiled out behind SEAL_CHECK_HEADER — and the fork's
        # EncryptionParameters::save_size under-reports by 8 bytes, so the
        # size field cannot be trusted for slicing): hand the reader the
        # whole remainder; it consumes exactly the fields it needs.
        payload = data[offset + HEADER_SIZE :]
    else:
        raise ValueError("unsupported compression mode")
    return payload, size


def _u64s(arr) -> bytes:
    return np.ascontiguousarray(np.asarray(arr), dtype="<u8").tobytes()


def _int_array_save(arr) -> bytes:
    """IntArray wire format: inner SEALHeader + u64 count + raw u64 data."""
    flat = np.asarray(arr).reshape(-1)
    payload = struct.pack("<Q", flat.size) + _u64s(flat)
    return _frame(payload, COMPR_NONE)


def _int_array_load(data: bytes, offset: int):
    payload, size = _unframe(data, offset)
    (count,) = struct.unpack_from("<Q", payload, 0)
    arr = np.frombuffer(payload, dtype="<u8", count=count, offset=8).astype(np.uint64)
    return arr, offset + size


def _clean_loader(fn):
    """Wire readers walk payloads with struct.unpack_from; on a payload
    truncated mid-field that raises struct.error, which is not part of the
    ValueError family callers are promised (failure-detection contract,
    tests/test_serialization loader fuzz).  Normalize at the API boundary."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except struct.error as e:
            raise ValueError(f"loaded object payload is invalid: {e}") from e

    return wrapped


# ---------------------------------------------------------------------------
# per-object payloads
# ---------------------------------------------------------------------------

def _modulus_payload(m: Modulus) -> bytes:
    return struct.pack("<Q", m.value)


def _parms_payload(parms: EncryptionParameters) -> bytes:
    out = struct.pack("<B", int(parms.scheme))
    out += struct.pack("<Q", parms.poly_modulus_degree)
    out += struct.pack("<Q", parms.n_special_primes)
    out += struct.pack("<Q", len(parms.coeff_modulus))
    for m in parms.coeff_modulus:
        out += _frame(_modulus_payload(m), COMPR_NONE)
    out += _frame(_modulus_payload(parms.plain_modulus), COMPR_NONE)
    return out


def _plaintext_payload(p: Plaintext) -> bytes:
    out = _u64s(np.array(p.parms_id, dtype=np.uint64))
    out += struct.pack("<Q", p.coeff_count)
    out += struct.pack("<d", p.scale)
    out += _int_array_save(p.data)
    return out


def _ciphertext_payload(c: Ciphertext) -> bytes:
    out = _u64s(np.array(c.parms_id, dtype=np.uint64))
    out += struct.pack("<B", 1 if c.is_ntt_form else 0)
    out += struct.pack("<Q", c.size)
    out += struct.pack("<Q", c.poly_modulus_degree)
    out += struct.pack("<Q", c.coeff_modulus_size)
    out += struct.pack("<d", c.scale)
    out += _int_array_save(np.asarray(c.data))
    return out


def _kswitch_payload(k: KSwitchKeys) -> bytes:
    out = _u64s(np.array(k.parms_id, dtype=np.uint64))
    out += struct.pack("<Q", len(k.keys))
    for row in k.keys:
        out += struct.pack("<Q", len(row))
        for pk in row:
            out += _frame(_ciphertext_payload(pk.data), COMPR_NONE)
    return out


def save(obj, compr_mode: int = COMPR_NONE) -> bytes:
    """Serialize any framework object to the reference wire format."""
    if isinstance(obj, EncryptionParameters):
        payload = _parms_payload(obj)
    elif isinstance(obj, Modulus):
        payload = _modulus_payload(obj)
    elif isinstance(obj, SecretKey):
        # SecretKey.save == wrapped Plaintext.save (secretkey.h)
        pt = Plaintext(
            data=np.asarray(obj.data), parms_id=obj.parms_id, scale=1.0
        )
        payload = _plaintext_payload(pt)
    elif isinstance(obj, PublicKey):
        payload = _ciphertext_payload(obj.data)
    elif isinstance(obj, Plaintext):
        payload = _plaintext_payload(obj)
    elif isinstance(obj, Ciphertext):
        payload = _ciphertext_payload(obj)
    elif isinstance(obj, KSwitchKeys):
        payload = _kswitch_payload(obj)
    else:
        raise TypeError(f"cannot serialize {type(obj)}")
    return _frame(payload, compr_mode)


# ---------------------------------------------------------------------------
# loaders
# ---------------------------------------------------------------------------

@_clean_loader
def load_modulus(data: bytes) -> Modulus:
    payload, _ = _unframe(data)
    (v,) = struct.unpack_from("<Q", payload, 0)
    return Modulus(v)


@_clean_loader
def load_parms(data: bytes) -> EncryptionParameters:
    payload, _ = _unframe(data)
    pos = 0
    (scheme,) = struct.unpack_from("<B", payload, pos); pos += 1
    (degree,) = struct.unpack_from("<Q", payload, pos); pos += 8
    (nsp,) = struct.unpack_from("<Q", payload, pos); pos += 8
    if nsp < 1:
        raise ValueError("EncryptionParameters: n_special_primes is invalid")
    (count,) = struct.unpack_from("<Q", payload, pos); pos += 8
    mods = []
    for _ in range(count):
        inner, size = _unframe(payload, pos)
        (v,) = struct.unpack_from("<Q", inner, 0)
        mods.append(Modulus(v))
        pos += size
    inner, size = _unframe(payload, pos)
    (t,) = struct.unpack_from("<Q", inner, 0)
    pos += size

    parms = EncryptionParameters(SchemeType(scheme))
    if degree:
        parms.set_poly_modulus_degree(degree)
    if mods:
        parms.set_coeff_modulus(mods)
    if t:
        parms.set_plain_modulus(t)
    parms.set_n_special_primes(nsp)
    return parms


def _plaintext_from(payload: bytes):
    pos = 0
    parms_id = tuple(
        int(v) for v in np.frombuffer(payload, dtype="<u8", count=4, offset=pos)
    )
    pos += 32
    (coeff_count,) = struct.unpack_from("<Q", payload, pos); pos += 8
    (scale,) = struct.unpack_from("<d", payload, pos); pos += 8
    arr, pos = _int_array_load(payload, pos)
    return parms_id, coeff_count, scale, arr, pos


@_clean_loader
def load_plaintext(data: bytes, context=None) -> Plaintext:
    payload, _ = _unframe(data)
    parms_id, coeff_count, scale, arr, _ = _plaintext_from(payload)
    if parms_id != PARMS_ID_ZERO and context is not None:
        cd = context.get_context_data(parms_id)
        if cd is None:
            raise ValueError("plaintext parms_id is not valid for the context")
        L = len(cd.parms.coeff_modulus)
        n = cd.parms.poly_modulus_degree
        arr = arr.reshape(L, n)
    return Plaintext(data=arr, parms_id=parms_id, scale=scale)


def _ciphertext_from(payload: bytes, context):
    pos = 0
    parms_id = tuple(
        int(v) for v in np.frombuffer(payload, dtype="<u8", count=4, offset=pos)
    )
    pos += 32
    (is_ntt,) = struct.unpack_from("<B", payload, pos); pos += 1
    (size,) = struct.unpack_from("<Q", payload, pos); pos += 8
    (degree,) = struct.unpack_from("<Q", payload, pos); pos += 8
    (L,) = struct.unpack_from("<Q", payload, pos); pos += 8
    (scale,) = struct.unpack_from("<d", payload, pos); pos += 8
    arr, pos = _int_array_load(payload, pos)

    if context is not None:
        cd = context.get_context_data(parms_id)
        if cd is None:
            raise ValueError("ciphertext parms_id is not valid for the context")
        if degree != cd.parms.poly_modulus_degree or L != len(cd.parms.coeff_modulus):
            raise ValueError("ciphertext metadata mismatch")

    if arr.size == size * L * degree:
        data = np.ascontiguousarray(arr.reshape(size, L, degree))
    elif arr.size == (size // 2 + size % 2) * L * degree or arr.size == L * degree:
        # seeded ciphertext: only c0 stored + seed marker
        if context is None:
            raise ValueError("loading a seeded ciphertext requires a context")
        c0 = arr.reshape(-1, L, degree)
        seed = np.frombuffer(payload, dtype="<u8", count=8, offset=pos)
        from .utils.blake2 import Blake2xbPRNG
        from .utils.prng import sample_poly_uniform
        from .ops.ntt import ntt_forward

        cd = context.get_context_data(parms_id)
        rng = Blake2xbPRNG(tuple(int(s) for s in seed))
        c1 = sample_poly_uniform(rng, cd.parms.coeff_modulus, degree)
        if not is_ntt:
            pass  # sampled directly in target domain for non-NTT seeded saves
        data = np.asarray(
            np.concatenate([c0, c1[None, :, :]], axis=0)
        )
    else:
        raise ValueError("ciphertext data size mismatch")
    return Ciphertext(data=data, parms_id=parms_id, is_ntt_form=bool(is_ntt), scale=scale)


class SerializableCiphertext:
    """Seed-compressed ciphertext wrapper (reference: serializable.h).

    Saves at roughly half size: the c0 polynomial plus the 64-byte c1 seed
    (wire format: ciphertext members with a half-size IntArray followed by
    the raw seed — matching Ciphertext::save_members' has_seed_marker
    branch, ciphertext.cpp:189-209).  Load through load_ciphertext with a
    context; expansion regenerates c1 from the seed.
    """

    def __init__(self, ct: Ciphertext, seed):
        self.ct = ct
        self.seed = tuple(int(s) for s in seed)

    def save(self, compr_mode: int = COMPR_NONE) -> bytes:
        c = self.ct
        arr = np.asarray(c.data)
        if arr.shape[0] != 2:
            raise ValueError("seeded serialization needs a size-2 ciphertext")
        payload = bytearray()
        payload += _u64s(np.asarray(c.parms_id, dtype=np.uint64))
        payload += struct.pack("<B", 1 if c.is_ntt_form else 0)
        payload += struct.pack("<Q", 2)
        payload += struct.pack("<Q", arr.shape[2])
        payload += struct.pack("<Q", arr.shape[1])
        payload += struct.pack("<d", c.scale)
        payload += _int_array_save(arr[0])
        payload += _u64s(np.asarray(self.seed, dtype=np.uint64))
        return _frame(bytes(payload), compr_mode)


class SerializableKSwitchKeys:
    """Seed-compressed key-switch keys (RelinKeys / GaloisKeys) wrapper
    (reference: Serializable<RelinKeys>/<GaloisKeys>, keygenerator.h +
    serializable.h): every bundle ciphertext serializes as c0 + its 64-byte
    c1 seed — roughly half the wire size of expanded keys, the dominant
    bandwidth cost of shipping Galois-key sets to a serving accelerator.

    `.obj` is the fully expanded keys object (usable directly);
    load the saved bytes with load_relin_keys / load_galois_keys — the
    seeded inner ciphertexts expand transparently on load.
    """

    def __init__(self, obj: KSwitchKeys, seed_rows):
        self.obj = obj
        self.seed_rows = seed_rows

    def save(self, compr_mode: int = COMPR_NONE) -> bytes:
        k = self.obj
        payload = bytearray()
        payload += _u64s(np.array(k.parms_id, dtype=np.uint64))
        payload += struct.pack("<Q", len(k.keys))
        for row, seeds in zip(k.keys, self.seed_rows):
            payload += struct.pack("<Q", len(row))
            for pk, seed in zip(row, seeds):
                payload += SerializableCiphertext(pk.data, seed).save(COMPR_NONE)
        return _frame(bytes(payload), compr_mode)


def _validate_loaded(obj, context, what: str):
    """Serialization is the trust boundary: mirror the reference's checked
    load (valcheck.cpp is_valid_for after unsafe_load) — metadata, buffer,
    AND per-limb residue bounds."""
    from . import valcheck

    if not valcheck.is_data_valid_for(obj, context):
        raise ValueError(f"loaded {what} data is invalid for the context "
                         "(residues out of bounds)")


@_clean_loader
def load_ciphertext(data: bytes, context=None, validate: bool = True) -> Ciphertext:
    payload, _ = _unframe(data)
    ct = _ciphertext_from(payload, context)
    if context is not None and validate:
        from . import valcheck

        if not valcheck.is_metadata_valid_for(ct, context):
            raise ValueError("loaded ciphertext metadata is invalid for the context")
        _validate_loaded(ct, context, "ciphertext")
    return ct


@_clean_loader
def load_secret_key(data: bytes, context=None, validate: bool = True) -> SecretKey:
    p = load_plaintext(data, context)
    sk = SecretKey(data=np.asarray(p.data), parms_id=p.parms_id)
    if context is not None and validate:
        _validate_loaded(sk, context, "secret key")
    return sk


@_clean_loader
def load_public_key(data: bytes, context=None, validate: bool = True) -> PublicKey:
    ct = load_ciphertext(data, context, validate=False)
    pk = PublicKey(data=ct, parms_id=ct.parms_id)
    if context is not None and validate:
        from . import valcheck

        if not valcheck.is_metadata_valid_for(pk, context):
            raise ValueError("loaded public key metadata is invalid for the context")
        _validate_loaded(pk, context, "public key")
    return pk


def _load_kswitch_into(cls, data: bytes, context=None, validate: bool = True):
    payload, _ = _unframe(data)
    pos = 0
    parms_id = tuple(
        int(v) for v in np.frombuffer(payload, dtype="<u8", count=4, offset=pos)
    )
    pos += 32
    (dim1,) = struct.unpack_from("<Q", payload, pos); pos += 8
    keys = []
    for _ in range(dim1):
        (dim2,) = struct.unpack_from("<Q", payload, pos); pos += 8
        row = []
        for _ in range(dim2):
            inner, size = _unframe(payload, pos)
            ct = _ciphertext_from(inner, context)
            row.append(PublicKey(data=ct, parms_id=ct.parms_id))
            pos += size
        keys.append(row)
    obj = cls()
    obj.keys = keys
    obj.parms_id = parms_id
    if context is not None and validate:
        from . import valcheck

        if not valcheck.is_metadata_valid_for(obj, context):
            raise ValueError("loaded key-switch keys metadata is invalid "
                             "for the context")
        _validate_loaded(obj, context, "key-switch keys")
    return obj


@_clean_loader
def load_kswitch_keys(data: bytes, context=None, validate: bool = True) -> KSwitchKeys:
    return _load_kswitch_into(KSwitchKeys, data, context, validate)


@_clean_loader
def load_relin_keys(data: bytes, context=None, validate: bool = True) -> RelinKeys:
    return _load_kswitch_into(RelinKeys, data, context, validate)


@_clean_loader
def load_galois_keys(data: bytes, context=None, validate: bool = True) -> GaloisKeys:
    return _load_kswitch_into(GaloisKeys, data, context, validate)


# ---------------------------------------------------------------------------
# Streaming / bounded-stream surface (reference: serialization.h:211-278,
# util/streambuf.h).  save_size precomputes the buffer bound WITHOUT
# materializing the payload; save_to/read_framed work on file-like streams
# and never read past one framed object (several objects can share one
# stream back to back, exactly like the reference's Save/Load on iostreams).
# ---------------------------------------------------------------------------

def _deflate_bound(n: int) -> int:
    """zlib compressBound(n) (the reference's upper bound for compr_mode
    deflate)."""
    return n + (n >> 12) + (n >> 14) + (n >> 25) + 13


def _int_array_size(count: int) -> int:
    return HEADER_SIZE + 8 + 8 * count


def _payload_size(obj) -> int:
    """Exact wire payload size (before framing), computed arithmetically
    from metadata — no payload materialization (serialization.h save_size)."""
    if isinstance(obj, SerializableCiphertext):
        arr = np.asarray(obj.ct.data)
        # members + half-size IntArray (c0 only) + 64-byte seed
        return 32 + 1 + 8 + 8 + 8 + 8 + _int_array_size(int(arr[0].size)) + 64
    if isinstance(obj, SerializableKSwitchKeys):
        total = 32 + 8
        for row, seeds in zip(obj.obj.keys, obj.seed_rows):
            total += 8
            for pk, _ in zip(row, seeds):
                total += HEADER_SIZE + _payload_size(
                    SerializableCiphertext(pk.data, (0,) * 8)
                )
        return total
    if isinstance(obj, Modulus):
        return 8
    if isinstance(obj, EncryptionParameters):
        L = len(obj.coeff_modulus)
        return 1 + 8 + 8 + 8 + (L + 1) * (HEADER_SIZE + 8)
    if isinstance(obj, SecretKey):
        return 32 + 8 + 8 + _int_array_size(int(np.asarray(obj.data).size))
    if isinstance(obj, Plaintext):
        return 32 + 8 + 8 + _int_array_size(int(np.asarray(obj.data).size))
    if isinstance(obj, PublicKey):
        return _payload_size(obj.data)
    if isinstance(obj, Ciphertext):
        return 32 + 1 + 8 + 8 + 8 + 8 + _int_array_size(
            int(np.asarray(obj.data).size)
        )
    if isinstance(obj, KSwitchKeys):
        total = 32 + 8
        for row in obj.keys:
            total += 8
            for pk in row:
                total += HEADER_SIZE + _payload_size(pk.data)
        return total
    raise TypeError(f"cannot size {type(obj)}")


def save_size(obj, compr_mode: int = COMPR_NONE) -> int:
    """Bytes needed to save `obj`: exact for COMPR_NONE, an upper bound
    for COMPR_DEFLATE (reference: Serialization::ComprSizeEstimate)."""
    n = _payload_size(obj)
    if compr_mode == COMPR_NONE:
        return HEADER_SIZE + n
    if compr_mode == COMPR_DEFLATE:
        return HEADER_SIZE + _deflate_bound(n)
    raise ValueError("unsupported compression mode")


def save_to(obj, stream, compr_mode: int = COMPR_NONE) -> int:
    """Write one framed object to a file-like stream; returns the byte
    count (== save_size for COMPR_NONE, <= for deflate).  Serializable
    (seed-compressed) wrappers stream through their own save()."""
    if isinstance(obj, (SerializableCiphertext, SerializableKSwitchKeys)):
        blob = obj.save(compr_mode)
    else:
        blob = save(obj, compr_mode)
    stream.write(blob)
    return len(blob)


def read_framed(stream) -> bytes:
    """Read EXACTLY one framed object from a stream (bounded by the
    SEALHeader size field — never consumes past the object)."""
    header = stream.read(HEADER_SIZE)
    if len(header) != HEADER_SIZE:
        raise ValueError("loaded SEALHeader is invalid")
    magic, hsize = struct.unpack_from("<HB", header, 0)
    if magic != SEAL_MAGIC or hsize != HEADER_SIZE:
        raise ValueError("loaded SEALHeader is invalid")
    (total,) = struct.unpack_from("<Q", header, 8)
    if total < HEADER_SIZE:
        raise ValueError("loaded SEALHeader is invalid")
    body = stream.read(total - HEADER_SIZE)
    if len(body) != total - HEADER_SIZE:
        raise ValueError("loaded SEALHeader is invalid")
    return header + body


def load_ciphertext_from(stream, context=None, validate: bool = True) -> Ciphertext:
    return load_ciphertext(read_framed(stream), context, validate)


def load_plaintext_from(stream, context=None) -> Plaintext:
    return load_plaintext(read_framed(stream), context)


def load_secret_key_from(stream, context=None, validate: bool = True) -> SecretKey:
    return load_secret_key(read_framed(stream), context, validate)


def load_public_key_from(stream, context=None, validate: bool = True) -> PublicKey:
    return load_public_key(read_framed(stream), context, validate)


def load_relin_keys_from(stream, context=None, validate: bool = True) -> RelinKeys:
    return load_relin_keys(read_framed(stream), context, validate)


def load_galois_keys_from(stream, context=None, validate: bool = True) -> GaloisKeys:
    return load_galois_keys(read_framed(stream), context, validate)


def load_parms_from(stream) -> EncryptionParameters:
    return load_parms(read_framed(stream))


__all__ += [
    "save_size",
    "save_to",
    "read_framed",
    "load_ciphertext_from",
    "load_plaintext_from",
    "load_secret_key_from",
    "load_public_key_from",
    "load_relin_keys_from",
    "load_galois_keys_from",
    "load_parms_from",
]

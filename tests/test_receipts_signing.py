"""HMAC signing / verification modes (parity: reference receipts.py:86-179)."""

import numpy as np

from oscillink_tpu import OscillinkLattice, verify_receipt, verify_receipt_mode


def _lat(seed=0):
    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((24, 8)).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=3)
    lat.set_query(rng.standard_normal(8).astype(np.float32))
    return lat


def test_signature_roundtrip_minimal():
    lat = _lat()
    lat.set_receipt_secret("topsecret")
    rec = lat.receipt()
    assert verify_receipt(rec, "topsecret")
    assert not verify_receipt(rec, "wrong")
    ok, payload = verify_receipt_mode(rec, "topsecret", require_mode="minimal")
    assert ok and payload["mode"] == "minimal"


def test_signature_extended_mode():
    lat = _lat(1)
    lat.set_receipt_secret(b"k2")
    lat.set_signature_mode("extended")
    rec = lat.receipt()
    ok, payload = verify_receipt_mode(rec, b"k2", require_mode="extended")
    assert ok and payload["mode"] == "extended"
    assert payload["params"]["lamG"] == lat.lamG
    ok2, _ = verify_receipt_mode(rec, b"k2", require_mode="minimal")
    assert not ok2


def test_sig_v_gating():
    lat = _lat(2)
    lat.set_receipt_secret("s")
    rec = lat.receipt()
    ok, _ = verify_receipt_mode(rec, "s", required_sig_v=1)
    assert ok
    ok2, _ = verify_receipt_mode(rec, "s", required_sig_v=2)
    assert not ok2


def test_tampered_payload_fails():
    lat = _lat(3)
    lat.set_receipt_secret("s")
    rec = lat.receipt()
    rec["meta"]["signature"]["payload"]["deltaH_total"] = 12345.0
    assert not verify_receipt(rec, "s")


def test_unsigned_receipt_has_no_block():
    lat = _lat(4)
    rec = lat.receipt()
    assert "signature" not in rec["meta"]
    assert not verify_receipt(rec, "s")


def test_verify_current_receipt():
    lat = _lat(5)
    lat.set_receipt_secret("abc")
    assert lat.verify_current_receipt("abc")
    assert not lat.verify_current_receipt("xyz")


def test_minimal_subset_downscope():
    """An extended payload whose full signature doesn't match can still be
    accepted when the signature was actually minted over the minimal subset
    (reference receipts.py:158-176)."""
    from oscillink_tpu.core.receipts import sign_payload

    lat = _lat(7)
    lat.set_receipt_secret("s")
    rec = lat.receipt()  # minimal signature
    minimal_payload = rec["meta"]["signature"]["payload"]
    # wrap the minimal-signed signature inside an extended-looking payload
    forged_extended = {
        **minimal_payload,
        "mode": "extended",
        "params": {"lamG": lat.lamG},
    }
    rec["meta"]["signature"]["payload"] = forged_extended
    ok_plain, _ = verify_receipt_mode(rec, "s")
    assert not ok_plain  # full extended payload doesn't match the signature
    ok_subset, payload = verify_receipt_mode(rec, "s", minimal_subset=True)
    assert ok_subset and payload["mode"] == "minimal"
    assert payload["deltaH_total"] == minimal_payload["deltaH_total"]
    # but subset downscope must NOT satisfy an extended-mode requirement
    ok_ext, _ = verify_receipt_mode(
        rec, "s", minimal_subset=True, require_mode="extended"
    )
    assert not ok_ext
    # sanity: the minimal subset signature really is what was minted
    assert rec["meta"]["signature"]["signature"] == sign_payload(minimal_payload, "s")


def test_invalid_modes_raise():
    lat = _lat(6)
    import pytest

    with pytest.raises(ValueError):
        lat.set_signature_mode("bogus")
    with pytest.raises(ValueError):
        lat.set_receipt_detail("bogus")


def test_key_rotation_with_kid():
    """Reference roadmap (unchecked upstream): multi-secret receipt signing.
    set_receipt_secret(secret, kid=...) stamps the block; verifiers holding
    a {kid: secret} rotation map verify without trial-and-error, and maps
    without the kid still rotate through every secret."""
    import numpy as np

    from oscillink_tpu import OscillinkLattice, verify_receipt, verify_receipt_mode

    rng = np.random.default_rng(0)
    Y = rng.standard_normal((30, 8)).astype(np.float32)
    lat = OscillinkLattice(Y, kneighbors=4)
    lat.set_query((Y[0] / np.linalg.norm(Y[0])).astype(np.float32))
    lat.settle(max_iters=8, tol=1e-3)
    lat.set_receipt_secret("new-secret", kid="2026-08")
    rec = lat.receipt()
    assert rec["meta"]["signature"]["kid"] == "2026-08"

    rotation = {"2026-07": "old-secret", "2026-08": "new-secret"}
    assert verify_receipt(rec, rotation)
    assert verify_receipt(rec, "new-secret")  # plain secret still works
    assert not verify_receipt(rec, {"2026-07": "old-secret"})  # kid unknown
    assert not verify_receipt(rec, {"2026-08": "wrong"})
    ok, payload = verify_receipt_mode(rec, rotation)
    assert ok and payload["state_sig"]

    # a receipt signed WITHOUT a kid verifies against any mapped secret
    lat.set_receipt_secret("old-secret")
    rec2 = lat.receipt()
    assert "kid" not in rec2["meta"]["signature"]
    assert verify_receipt(rec2, rotation)
    assert not verify_receipt(rec2, {"k": "neither"})

/* Host-side planes -> sparse (index, value) extraction for the decode
 * direction of the exchange (ebcc_tpu/core/codec.py::_decode_streams_device).
 *
 * The stream payload is a dense bitplane stack, but its information is
 * sparse: only coefficients significant at the stream cut carry bits.  The
 * numpy unpack (per-plane unpackbits + shift accumulate over the dense
 * grid) costs dense-size work per batch; this routine walks the planes
 * byte-column-wise, ORs the kept rows to skip all-zero byte columns (the
 * common case at typical bounds), and emits compacted (position, signed
 * magnitude-at-cut) pairs directly — element work scales with the
 * significant count, byte work with the grid/8.
 *
 * Layout contract (mirrors core/stream.py + FLAG_BASE_PARTIAL): raw =
 * [kept-1 full plane rows][partial row: pb bytes][sign plane row], with
 * pb == plane_bytes for ordinary payloads.
 */

#include <cstddef>
#include <cstdint>

extern "C" {

/* -> number of pairs written.  idx_out/val_out must hold d0*hp*wp entries.
 * Returns (size_t)-1 on malformed sizes. */
size_t etpu_planes_to_sparse(const uint8_t *raw, size_t raw_len, int kept,
                             size_t pb, int d0, int hp, int wp,
                             int32_t *idx_out, int32_t *val_out) {
  if (kept <= 0 || wp % 8 != 0) return (size_t)-1;
  const size_t plane_bytes = (size_t)d0 * hp * (wp / 8);
  const int full = kept - 1;
  if (pb > plane_bytes) return (size_t)-1;
  if (raw_len != (size_t)full * plane_bytes + pb + plane_bytes)
    return (size_t)-1;
  const uint8_t *signs = raw + (size_t)full * plane_bytes + pb;
  const uint8_t *last = raw + (size_t)full * plane_bytes;

  size_t k = 0;
  for (size_t byte = 0; byte < plane_bytes; ++byte) {
    uint8_t any = byte < pb ? last[byte] : 0;
    for (int s = 0; s < full; ++s) any |= raw[(size_t)s * plane_bytes + byte];
    if (!any) continue;
    const uint8_t lastb = byte < pb ? last[byte] : 0;
    const uint8_t signb = signs[byte];
    for (int bit = 0; bit < 8; ++bit) {
      const uint8_t mask = (uint8_t)(1u << (7 - bit));
      if (!(any & mask)) continue;
      uint32_t mag = 0;
      for (int s = 0; s < full; ++s)
        mag = (mag << 1) | ((raw[(size_t)s * plane_bytes + byte] & mask)
                                ? 1u : 0u);
      mag = (mag << 1) | ((lastb & mask) ? 1u : 0u);
      /* any==1 guarantees mag != 0 */
      idx_out[k] = (int32_t)(byte * 8 + bit);
      val_out[k] = (signb & mask) ? -(int32_t)mag : (int32_t)mag;
      ++k;
    }
  }
  return k;
}

} /* extern "C" */

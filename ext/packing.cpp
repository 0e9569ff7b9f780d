// Native sequence-packing runtime for dct_autoencoder_tpu.
//
// The NaViT-style greedy packer and the padded-batch assembly are the
// host-side hot path feeding the TPU: at thousands of images/second the
// Python per-image loop and the per-field numpy slice writes become the
// bottleneck (the reference keeps this loop in Python too —
// feature_extraction_dct_autoencoder.py:454-605).  This translation unit
// implements both as tight loops over raw buffers, exposed through a C ABI
// consumed via ctypes (no pybind11 dependency).
//
// Build:  g++ -O3 -march=native -shared -fPIC -o libdctpack.so packing.cpp
// (driven by ext/build.sh / the lazy builder in patches/native.cpp.py)

#include <cstdint>
#include <cstring>

extern "C" {

// Greedy first-fit packing of per-image token counts into rows of at most
// max_seq_len tokens.  A row is closed as soon as the next image would
// overflow it (identical semantics to the reference's
// _group_patches_by_max_seq_len).
//
// lengths:      n_images token counts
// row_ids:      out, n_images — row index assigned to each image
// image_slot:   out, n_images — image index *within* its row
// row_offsets:  out, n_images — starting token offset of the image in its row
// returns the number of rows used.
int64_t dctpack_greedy_pack(const int64_t* lengths, int64_t n_images,
                            int64_t max_seq_len, int64_t* row_ids,
                            int64_t* image_slot, int64_t* row_offsets) {
  int64_t row = 0;
  int64_t used = 0;  // tokens used in the open row
  int64_t slot = 0;  // images in the open row
  for (int64_t i = 0; i < n_images; ++i) {
    const int64_t k = lengths[i];
    if (used + k > max_seq_len) {
      ++row;
      used = 0;
      slot = 0;
    }
    row_ids[i] = row;
    image_slot[i] = slot;
    row_offsets[i] = used;
    used += k;
    ++slot;
  }
  return (n_images > 0) ? row + 1 : 0;
}

// Scatter per-image token streams into padded (b, S, ...) batch buffers.
//
// patches:    concatenated (total_tokens, pz) float32 tokens, image-major
// positions:  concatenated (total_tokens, 2) int32
// channels:   concatenated (total_tokens,) int32
// lengths / row_ids / image_slot / row_offsets: as from dctpack_greedy_pack
// out_*:      zero-initialized buffers of shape (b, S, pz) / (b, S, 2) /
//             (b, S) / (b, S); out_pad must start all-true (1).
void dctpack_fill_batch(const float* patches, const int32_t* positions,
                        const int32_t* channels, const int64_t* lengths,
                        const int64_t* row_ids, const int64_t* image_slot,
                        const int64_t* row_offsets, int64_t n_images,
                        int64_t pz, int64_t max_seq_len, float* out_patches,
                        int32_t* out_positions, int32_t* out_channels,
                        int32_t* out_image_ids, uint8_t* out_pad) {
  int64_t tok = 0;  // running offset into the concatenated inputs
  for (int64_t i = 0; i < n_images; ++i) {
    const int64_t k = lengths[i];
    const int64_t row = row_ids[i];
    const int64_t off = row_offsets[i];
    const int64_t base = row * max_seq_len + off;

    std::memcpy(out_patches + base * pz, patches + tok * pz,
                sizeof(float) * k * pz);
    std::memcpy(out_positions + base * 2, positions + tok * 2,
                sizeof(int32_t) * k * 2);
    std::memcpy(out_channels + base, channels + tok, sizeof(int32_t) * k);

    const int32_t slot = static_cast<int32_t>(image_slot[i]);
    for (int64_t j = 0; j < k; ++j) {
      out_image_ids[base + j] = slot;
      out_pad[base + j] = 0;
    }
    tok += k;
  }
}

// Build the (b, s, s) block-diagonal attention mask from per-row image ids
// and the padding mask: allowed(i, j) = (ids[i] == ids[j]) && !pad[j].
// Only needed by consumers wanting the materialized mask (the model derives
// masking from ids directly).
void dctpack_build_attn_mask(const int32_t* image_ids, const uint8_t* pad,
                             int64_t b, int64_t s, uint8_t* out_mask) {
  for (int64_t r = 0; r < b; ++r) {
    const int32_t* ids = image_ids + r * s;
    const uint8_t* p = pad + r * s;
    uint8_t* m = out_mask + r * s * s;
    for (int64_t i = 0; i < s; ++i) {
      const int32_t qi = ids[i];
      uint8_t* mi = m + i * s;
      for (int64_t j = 0; j < s; ++j) {
        mi[j] = static_cast<uint8_t>((qi == ids[j]) & (p[j] == 0));
      }
    }
  }
}

}  // extern "C"

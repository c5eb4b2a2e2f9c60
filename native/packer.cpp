// Native host-side runtime: multimodal sequence packing + JSONL indexing.
//
// The packer is the per-step host hot path (the device step consumes its
// fixed-shape index maps; see metamorph_tpu/multimodal/packing.py for the
// algorithm spec and the reference citations). This C++ implementation is
// semantically identical to the Python packer — equivalence is enforced by
// tests/test_native.py — and exists so a multi-host input pipeline can pack
// large batches without holding the GIL.
//
// Exposed via a C ABI for ctypes. Build: `make -C native` -> libmmpack.so.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr int32_t kIgnoreIndex = -100;
constexpr int32_t kImageToken = -200;
constexpr int32_t kImStartId = 128256;

struct TokenEvent {
  int32_t token;
  int32_t label;
  int32_t img;    // image slot or -1
  int32_t j;      // token index within image
  bool answer;
};

}  // namespace

extern "C" {

// Packs B variable-length rows (concatenated ids/labels with row_lens) into
// fixed [B,T] planes. Returns 0 on success, <0 on error:
//   -1 slot overflow mid-row, -2 total slots exceed budget,
//   -3 image count exceeds tokens_per_image entries.
//
// tokens_per_image (nullable, n_tpi entries): per-slot variable token counts
// (anyres); slot base offsets in the flat image-token table become cumulative
// sums and the table capacity is gather_capacity. Uniform mode when null.
int mm_pack(const int32_t* ids, const int32_t* labels, const int32_t* row_lens,
            int B, int K, int T, int N, int left_pad,
            const int32_t* tokens_per_image, int n_tpi, int gather_capacity,
            int32_t* tokens, int32_t* labels_out, int32_t* attn, int32_t* pos,
            int32_t* gather, uint8_t* is_img, int32_t* ar_mask,
            int32_t* ar_b, int32_t* ar_p, int32_t* ar_t, float* ar_v,
            float* slot_used) {
  std::vector<int32_t> offsets;
  if (tokens_per_image) {
    offsets.resize(n_tpi + 1);
    offsets[0] = 0;
    for (int i = 0; i < n_tpi; ++i) offsets[i + 1] = offsets[i] + tokens_per_image[i];
  }
  const int A = tokens_per_image
                    ? (gather_capacity > 0 ? gather_capacity : offsets[n_tpi])
                    : N * K;
  // zero/default-fill outputs
  for (int i = 0; i < B * T; ++i) {
    tokens[i] = 0;
    labels_out[i] = kIgnoreIndex;
    attn[i] = 0;
    pos[i] = 0;
    gather[i] = A;  // dummy row
    is_img[i] = 0;
    ar_mask[i] = 0;
  }
  for (int i = 0; i < A; ++i) {
    ar_b[i] = 0; ar_p[i] = 0; ar_t[i] = 0; ar_v[i] = 0.f;
  }
  for (int i = 0; i < N; ++i) slot_used[i] = 0.f;

  int n_ar = 0;
  int cur_image_idx = 0;
  int64_t offset_in = 0;

  std::vector<TokenEvent> seq;
  std::vector<int> sentinels;

  for (int b = 0; b < B; ++b) {
    const int L_in = row_lens[b];
    const int32_t* row_ids = ids + offset_in;
    const int32_t* row_labs = labels + offset_in;
    offset_in += L_in;

    seq.clear();
    sentinels.clear();
    for (int i = 0; i < L_in; ++i)
      if (row_ids[i] == kImageToken) sentinels.push_back(i);

    if (sentinels.empty()) {
      // text-only sample consumes one placeholder slot (reference quirk)
      ++cur_image_idx;
      for (int i = 0; i < L_in; ++i)
        seq.push_back({row_ids[i], row_labs[i], -1, 0, false});
    } else {
      bool need_to_stop = false;
      int prev = -1;
      const int n_img = static_cast<int>(sentinels.size());
      for (int c = 0; c <= n_img; ++c) {
        const int end = (c < n_img) ? sentinels[c] : L_in;
        if (!need_to_stop) {
          for (int i = prev + 1; i < end; ++i)
            seq.push_back({row_ids[i], row_labs[i], -1, 0, false});
        }
        if (c < n_img) {
          // answer image iff the label right before the sentinel is <image_start>
          const bool has_chunk = end - (prev + 1) > 0;
          const bool answer = has_chunk && row_labs[end - 1] == kImStartId;
          int Ki = K;
          if (tokens_per_image) {
            if (cur_image_idx >= n_tpi) return -3;
            Ki = tokens_per_image[cur_image_idx];
          }
          if (static_cast<int>(seq.size()) + Ki > T) {
            need_to_stop = true;
          } else {
            const int slot = cur_image_idx;
            if (slot >= N) return -1;
            for (int j = 0; j < Ki; ++j)
              seq.push_back({0, kIgnoreIndex, slot, j, answer});
          }
          ++cur_image_idx;
        }
        prev = end;
      }
    }

    const int L = static_cast<int>(seq.size()) < T
                      ? static_cast<int>(seq.size()) : T;
    const int off = left_pad ? (T - L) : 0;
    for (int s = 0; s < L; ++s) {
      const TokenEvent& ev = seq[s];
      const int t = off + s;
      const int64_t idx = static_cast<int64_t>(b) * T + t;
      attn[idx] = 1;
      pos[idx] = s;
      if (ev.img >= 0) {
        is_img[idx] = 1;
        const int32_t base =
            tokens_per_image ? offsets[ev.img] : ev.img * K;
        gather[idx] = base + ev.j;
        slot_used[ev.img] = 1.f;
        if (ev.answer) {
          ar_mask[idx] = 1;
          if (s > 0 && n_ar < A) {
            ar_b[n_ar] = b;
            ar_p[n_ar] = t - 1;
            ar_t[n_ar] = base + ev.j;
            ar_v[n_ar] = 1.f;
            ++n_ar;
          }
        }
      } else {
        tokens[idx] = ev.token;
        labels_out[idx] = ev.label;
      }
    }
  }

  if (cur_image_idx > N) return -2;
  return 0;
}

// Byte-offset index of newline-delimited records. First call with
// offsets=nullptr to get the line count; then with a buffer of that size.
long jsonl_index(const char* path, int64_t* offsets, long capacity) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::vector<char> buf(1 << 20);
  long count = 0;
  int64_t pos = 0;
  int64_t line_start = 0;
  bool line_has_bytes = false;
  size_t got;
  while ((got = std::fread(buf.data(), 1, buf.size(), f)) > 0) {
    for (size_t i = 0; i < got; ++i) {
      if (!line_has_bytes) {
        line_start = pos + static_cast<int64_t>(i);
        line_has_bytes = true;
      }
      if (buf[i] == '\n') {
        if (offsets) {
          if (count >= capacity) { std::fclose(f); return -2; }
          offsets[count] = line_start;
        }
        ++count;
        line_has_bytes = false;
      }
    }
    pos += static_cast<int64_t>(got);
  }
  if (line_has_bytes) {  // trailing record without newline
    if (offsets) {
      if (count >= capacity) { std::fclose(f); return -2; }
      offsets[count] = line_start;
    }
    ++count;
  }
  std::fclose(f);
  return count;
}

}  // extern "C"

// ipcodec — native host codec for imageprocessor_tpu.
//
// Thin C ABI over libjpeg(-turbo) exposed to Python via ctypes
// (no pybind11 in this environment). Two capabilities beyond what the
// OpenCV wrapper offers:
//   * DCT-domain scaled decode (scale_num/8): decoding a 12 MP JPEG
//     directly at 1/2, 1/4 or 1/8 size costs a fraction of a full decode —
//     the right host-side move when a task only requests a thumbnail;
//   * header-only probe (dimensions + components) without entropy decode,
//     used by the batcher to pick resolution buckets before full decode.
//
// All functions are thread-safe (no shared state); libjpeg releases no
// GIL concerns since calls happen outside Python.
//
// Build: make native  (g++ -O2 -shared -fPIC ipcodec.cpp -ljpeg)

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
  char message[JMSG_LENGTH_MAX];
};

void error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  (*cinfo->err->format_message)(cinfo, err->message);
  longjmp(err->setjmp_buffer, 1);
}

void silence_output(j_common_ptr, int) {}

}  // namespace

extern "C" {

// Returns 0 on success. Fills w/h/components from the JPEG header only.
int ip_jpeg_probe(const uint8_t* data, size_t len, int* w, int* h,
                  int* components) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.emit_message = silence_output;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  *w = static_cast<int>(cinfo.image_width);
  *h = static_cast<int>(cinfo.image_height);
  *components = cinfo.num_components;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode to RGB888 with DCT-domain scaling scale_num/8 (scale_num in 1..8).
// `out` must hold out_w*out_h*3 bytes where out_w/out_h are the scaled
// dims previously obtained from ip_jpeg_scaled_dims. Returns 0 on success.
int ip_jpeg_decode(const uint8_t* data, size_t len, int scale_num,
                   uint8_t* out, int out_stride) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.emit_message = silence_output;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = scale_num;
  cinfo.scale_denom = 8;
  cinfo.dct_method = JDCT_ISLOW;  // libjpeg-turbo SIMD path
  jpeg_start_decompress(&cinfo);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<size_t>(cinfo.output_scanline)
                             * static_cast<size_t>(out_stride);
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Scaled output dimensions for scale_num/8 without decoding.
int ip_jpeg_scaled_dims(const uint8_t* data, size_t len, int scale_num,
                        int* out_w, int* out_h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.emit_message = silence_output;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.scale_num = scale_num;
  cinfo.scale_denom = 8;
  jpeg_calc_output_dimensions(&cinfo);
  *out_w = static_cast<int>(cinfo.output_width);
  *out_h = static_cast<int>(cinfo.output_height);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Encode RGB888 -> JPEG at `quality`. The shim allocates *out via malloc;
// caller frees with ip_free. Returns 0 on success.
int ip_jpeg_encode(const uint8_t* rgb, int w, int h, int stride, int quality,
                   uint8_t** out, size_t* out_len) {
  jpeg_compress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.emit_message = silence_output;
  unsigned char* buf = nullptr;
  unsigned long buflen = 0;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_compress(&cinfo);
    if (buf != nullptr) free(buf);
    return 1;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &buf, &buflen);
  cinfo.image_width = static_cast<JDIMENSION>(w);
  cinfo.image_height = static_cast<JDIMENSION>(h);
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = const_cast<JSAMPROW>(
        rgb + static_cast<size_t>(cinfo.next_scanline)
                  * static_cast<size_t>(stride));
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  *out = buf;
  *out_len = buflen;
  return 0;
}

void ip_free(void* p) { free(p); }

}  // extern "C"

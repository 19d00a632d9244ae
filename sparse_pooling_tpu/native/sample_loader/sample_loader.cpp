// Native per-frame sample loader: PNG -> canvas decode and velodyne ->
// filtered camera-frame points, each in one pass.
//
// Reference parity: the reference's host input path is numpy + PIL inside
// kitti_dataset/kitti_utils (and wavedata obj_utils for the scan); its
// MV3D side ships Cython/C++ for the host-hot loops. This rebuild's host
// loader runs on a single core feeding an 89 fps/chip device pipeline, so
// the two host-hot loops move to C++:
//
//   spt_decode_png_canvas  libpng row callbacks write RGB rows DIRECTLY
//                          into the caller's HxWx3 canvas (top-left) —
//                          no intermediate image, no convert, no pad copy.
//                          Returns the raw extent so the in-graph resize
//                          (ops/image_resize.py) gets its scale.
//   spt_load_points        fread the .bin once; single fused pass does the
//                          velo->rect affine transform (f32), the image-
//                          frustum projection test and the BEV area-extents
//                          test, writing survivors in scan order — the
//                          numpy twin (data/pointcloud.load_points_filtered)
//                          needs ~8 full-array passes for the same result.
//
// Python binding: native/sample_loader.py (ctypes), with the numpy/PIL
// twins as automatic fallback. Build: make -C this dir (libpng16 + zlib
// are system libraries).

#include <cstdint>
#include <cstdio>
#include <cstring>

#include <png.h>

extern "C" {

// ---------------------------------------------------------------- PNG

// Decode `path` into caller-owned canvas [canvas_h, canvas_w, 3] u8
// (row-major, already zeroed or not — rows beyond the raw extent are left
// untouched; callers pass a zeroed canvas). Any PNG color type is expanded
// to 8-bit RGB (palette/gray/alpha handled by libpng transforms).
// Returns 0 ok; 1 io/decode error; 2 raw image exceeds the canvas.
int spt_decode_png_canvas(const char* path, uint8_t* canvas, int canvas_h,
                          int canvas_w, int* raw_h, int* raw_w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return 1;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    fclose(fp);
    return 1;
  }
  if (setjmp(png_jmpbuf(png))) {  // libpng error path
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 1;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  // normalize every input to 8-bit RGB
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA || png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);

  if ((int)h > canvas_h || (int)w > canvas_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 2;
  }
  if (png_get_rowbytes(png, info) != w * 3) {  // transforms must yield RGB8
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 1;
  }

  // interlaced PNGs need the whole image resident; KITTI images are not
  // interlaced, but handle both by always reading row pointers into the
  // canvas rows (libpng writes passes in place for ADAM7 too)
  int passes = png_set_interlace_handling(png);
  for (int p = 0; p < passes; ++p)
    for (png_uint_32 y = 0; y < h; ++y)
      png_read_row(png, canvas + (size_t)y * canvas_w * 3, nullptr);

  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  *raw_h = (int)h;
  *raw_w = (int)w;
  return 0;
}

// ---------------------------------------------------------------- points

// velodyne .bin -> camera-frame filtered points, one fused pass.
//   m:  velo->rect rows (3x4, row-major, f32)  [from FrameCalib.velo_to_rect]
//   p2: projection rows (3x4, row-major, f32)
//   ext: x_min,x_max,y_min,y_max,z_min,z_max (BEV area extents, cam frame)
// Writes up to `cap` survivors into out (cap x 3, f32) in scan order and
// stores the TOTAL survivor count in n_total (callers detect overflow when
// n_total > cap and fall back to the numpy twin's seeded subsample).
// Returns 0 ok, 1 io error.
int spt_load_points(const char* velo_path, const float* m, const float* p2,
                    int img_h, int img_w, const float* ext, float* out,
                    int cap, int* n_total) {
  FILE* fp = fopen(velo_path, "rb");
  if (!fp) return 1;
  // stream in chunks: no full-scan buffer, stays in L2
  constexpr int kChunk = 4096;
  static thread_local float buf[kChunk * 4];
  const float wm1 = (float)img_w - 1.0f, hm1 = (float)img_h - 1.0f;
  int kept = 0, total = 0;
  size_t n;
  while ((n = fread(buf, sizeof(float) * 4, kChunk, fp)) > 0) {
    for (size_t i = 0; i < n; ++i) {
      const float vx = buf[i * 4], vy = buf[i * 4 + 1], vz = buf[i * 4 + 2];
      const float x = m[0] * vx + m[1] * vy + m[2] * vz + m[3];
      const float y = m[4] * vx + m[5] * vy + m[6] * vz + m[7];
      const float z = m[8] * vx + m[9] * vy + m[10] * vz + m[11];
      if (!(z > 0.0f)) continue;  // behind the image plane (and NaN-safe)
      const float u_n = p2[0] * x + p2[1] * y + p2[2] * z + p2[3];
      const float v_n = p2[4] * x + p2[5] * y + p2[6] * z + p2[7];
      const float w_n = p2[8] * x + p2[9] * y + p2[10] * z + p2[11];
      const float u = u_n / w_n, v = v_n / w_n;
      if (!(u >= 0.0f && u <= wm1 && v >= 0.0f && v <= hm1)) continue;
      if (!(x >= ext[0] && x < ext[1] && y >= ext[2] && y < ext[3] &&
            z >= ext[4] && z < ext[5]))
        continue;
      if (kept < cap) {
        out[kept * 3] = x;
        out[kept * 3 + 1] = y;
        out[kept * 3 + 2] = z;
        ++kept;
      }
      ++total;
    }
  }
  fclose(fp);
  *n_total = total;
  return 0;
}

}  // extern "C"

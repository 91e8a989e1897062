#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>

/* Deterministic test image: value = (x*7 + y*13 + (x*y)%31) & 0xFF */
static void fill(unsigned char *buf, int w, int h, int comps) {
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
            for (int c = 0; c < comps; c++)
                buf[(y * w + x) * comps + c] =
                    (unsigned char)((x * 7 + y * 13 + (x * y) % 31 + c * 40) & 0xFF);
}

static void write_jpeg(const char *path, int w, int h, int comps,
                       int arith, int quality) {
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    FILE *fp = fopen(path, "wb");
    unsigned char *img = malloc(w * h * comps);
    fill(img, w, h, comps);
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    jpeg_stdio_dest(&cinfo, fp);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = comps;
    cinfo.in_color_space = comps == 1 ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    cinfo.arith_code = arith ? TRUE : FALSE;
    if (comps == 3) { /* no subsampling: h1v1 keeps the pin simple */
        cinfo.comp_info[0].h_samp_factor = 1;
        cinfo.comp_info[0].v_samp_factor = 1;
    }
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = img + cinfo.next_scanline * w * comps;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    fclose(fp);
    free(img);
}

int main(void) {
    write_jpeg("/tmp/sof9_gray.jpg", 16, 16, 1, 1, 90);
    write_jpeg("/tmp/sof0_gray.jpg", 16, 16, 1, 0, 90);
    write_jpeg("/tmp/sof9_rgb.jpg", 16, 16, 3, 1, 90);
    write_jpeg("/tmp/sof0_rgb.jpg", 16, 16, 3, 0, 90);
    return 0;
}

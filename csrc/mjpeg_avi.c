/* MJPEG-in-AVI video writer/reader via libjpeg.
 *
 * The reference leans on external native video IO (decord / libav through
 * torchvision+imageio; SURVEY §2.6). This is the framework's own host-side
 * native codec: each frame JPEG-encoded (libjpeg) into a classic AVI RIFF
 * container — playable everywhere, no ffmpeg dependency. Exposed to Python
 * via ctypes (lavie_tpu/native).
 *
 * Build: gcc -O2 -shared -fPIC mjpeg_avi.c -ljpeg -o libmjpeg_avi.so
 */

#include <stddef.h>  /* size_t must precede jpeglib.h */
#include <stdio.h>
#include <jpeglib.h>
#include <setjmp.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* ------------------------------------------------------------------ */
/* little helpers                                                      */
/* ------------------------------------------------------------------ */

static void put_u32(FILE *f, uint32_t v) { fwrite(&v, 4, 1, f); }
static void put_u16(FILE *f, uint16_t v) { fwrite(&v, 2, 1, f); }
static void put_4cc(FILE *f, const char *s) { fwrite(s, 1, 4, f); }

struct jpeg_error_jmp {
    struct jpeg_error_mgr pub;
    jmp_buf setjmp_buffer;
};

static void error_exit_jmp(j_common_ptr cinfo) {
    struct jpeg_error_jmp *err = (struct jpeg_error_jmp *)cinfo->err;
    longjmp(err->setjmp_buffer, 1);
}

/* encode one RGB frame to JPEG in memory; returns malloc'd buffer */
static unsigned char *encode_frame(const uint8_t *rgb, int w, int h, int quality,
                                   unsigned long *out_size) {
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_jmp jerr;
    unsigned char *buf = NULL;
    *out_size = 0;

    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = error_exit_jmp;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_compress(&cinfo);
        free(buf);
        return NULL;
    }
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, &buf, out_size);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = (JSAMPROW)(rgb + (size_t)cinfo.next_scanline * w * 3);
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    return buf;
}

/* ------------------------------------------------------------------ */
/* writer                                                              */
/* ------------------------------------------------------------------ */

int write_mjpeg_avi(const char *path, const uint8_t *frames, int n, int h, int w,
                    int fps, int quality) {
    if (n <= 0 || h <= 0 || w <= 0 || fps <= 0) return -1;
    FILE *f = fopen(path, "wb");
    if (!f) return -2;

    /* encode all frames first so sizes are known */
    unsigned char **bufs = calloc(n, sizeof(*bufs));
    unsigned long *sizes = calloc(n, sizeof(*sizes));
    uint32_t max_size = 0, total = 0;
    for (int i = 0; i < n; i++) {
        bufs[i] = encode_frame(frames + (size_t)i * h * w * 3, w, h, quality, &sizes[i]);
        if (!bufs[i]) goto fail;
        if (sizes[i] > max_size) max_size = (uint32_t)sizes[i];
        total += (uint32_t)((sizes[i] + 1) & ~1u) + 8;
    }

    uint32_t hdrl_size = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40));
    uint32_t movi_size = 4 + total;
    uint32_t idx1_size = 16 * (uint32_t)n;
    uint32_t riff_size = 4 + (8 + hdrl_size) + (8 + movi_size) + (8 + idx1_size);

    put_4cc(f, "RIFF"); put_u32(f, riff_size); put_4cc(f, "AVI ");

    /* hdrl */
    put_4cc(f, "LIST"); put_u32(f, hdrl_size); put_4cc(f, "hdrl");
    put_4cc(f, "avih"); put_u32(f, 56);
    put_u32(f, 1000000u / (uint32_t)fps);  /* us per frame */
    put_u32(f, max_size * (uint32_t)fps);  /* max bytes/sec */
    put_u32(f, 0);                         /* padding granularity */
    put_u32(f, 0x10);                      /* AVIF_HASINDEX */
    put_u32(f, (uint32_t)n);
    put_u32(f, 0);                         /* initial frames */
    put_u32(f, 1);                         /* streams */
    put_u32(f, max_size);                  /* suggested buffer */
    put_u32(f, (uint32_t)w);
    put_u32(f, (uint32_t)h);
    put_u32(f, 0); put_u32(f, 0); put_u32(f, 0); put_u32(f, 0);

    /* strl */
    put_4cc(f, "LIST"); put_u32(f, 4 + (8 + 56) + (8 + 40)); put_4cc(f, "strl");
    put_4cc(f, "strh"); put_u32(f, 56);
    put_4cc(f, "vids"); put_4cc(f, "MJPG");
    put_u32(f, 0); put_u16(f, 0); put_u16(f, 0); /* flags, priority, language */
    put_u32(f, 0);                 /* initial frames */
    put_u32(f, 1);                 /* scale */
    put_u32(f, (uint32_t)fps);     /* rate */
    put_u32(f, 0);                 /* start */
    put_u32(f, (uint32_t)n);       /* length */
    put_u32(f, max_size);          /* suggested buffer */
    put_u32(f, 0xFFFFFFFFu);       /* quality */
    put_u32(f, 0);                 /* sample size */
    put_u16(f, 0); put_u16(f, 0); put_u16(f, (uint16_t)w); put_u16(f, (uint16_t)h);

    put_4cc(f, "strf"); put_u32(f, 40);
    put_u32(f, 40);                /* biSize */
    put_u32(f, (uint32_t)w); put_u32(f, (uint32_t)h);
    put_u16(f, 1); put_u16(f, 24); /* planes, bitcount */
    put_4cc(f, "MJPG");
    put_u32(f, (uint32_t)(w * h * 3));
    put_u32(f, 0); put_u32(f, 0); put_u32(f, 0); put_u32(f, 0);

    /* movi */
    put_4cc(f, "LIST"); put_u32(f, movi_size); put_4cc(f, "movi");
    uint32_t *offsets = calloc(n, sizeof(uint32_t));
    uint32_t off = 4; /* relative to 'movi' fourcc start */
    for (int i = 0; i < n; i++) {
        offsets[i] = off;
        put_4cc(f, "00dc"); put_u32(f, (uint32_t)sizes[i]);
        fwrite(bufs[i], 1, sizes[i], f);
        if (sizes[i] & 1) fputc(0, f);
        off += 8 + (uint32_t)((sizes[i] + 1) & ~1u);
    }

    /* idx1 */
    put_4cc(f, "idx1"); put_u32(f, idx1_size);
    for (int i = 0; i < n; i++) {
        put_4cc(f, "00dc"); put_u32(f, 0x10); /* AVIIF_KEYFRAME */
        put_u32(f, offsets[i]); put_u32(f, (uint32_t)sizes[i]);
    }

    free(offsets);
    for (int i = 0; i < n; i++) free(bufs[i]);
    free(bufs); free(sizes);
    fclose(f);
    return 0;

fail:
    for (int i = 0; i < n; i++) free(bufs[i]);
    free(bufs); free(sizes);
    fclose(f);
    return -3;
}

/* ------------------------------------------------------------------ */
/* reader                                                              */
/* ------------------------------------------------------------------ */

static int decode_frame(const unsigned char *jpeg, unsigned long size,
                        uint8_t *out, int w, int h) {
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_jmp jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = error_exit_jmp;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, jpeg, size);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    if ((int)cinfo.output_width != w || (int)cinfo.output_height != h) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = out + (size_t)cinfo.output_scanline * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* probe frame count + dims. returns 0 on success */
int probe_mjpeg_avi(const char *path, int *n, int *h, int *w, int *fps) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    char tag[5] = {0};
    uint32_t sz;
    if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "RIFF", 4)) { fclose(f); return -2; }
    fseek(f, 8, SEEK_SET); /* skip size + 'AVI ' is at 8..12 */
    fread(tag, 1, 4, f);
    if (memcmp(tag, "AVI ", 4)) { fclose(f); return -3; }
    /* find avih */
    while (fread(tag, 1, 4, f) == 4) {
        if (fread(&sz, 4, 1, f) != 1) break;
        if (!memcmp(tag, "LIST", 4)) { fread(tag, 1, 4, f); continue; }
        if (!memcmp(tag, "avih", 4)) {
            uint32_t us_per_frame, dummy, frames, width, height;
            fread(&us_per_frame, 4, 1, f);
            fread(&dummy, 4, 1, f); fread(&dummy, 4, 1, f); fread(&dummy, 4, 1, f);
            fread(&frames, 4, 1, f);
            fread(&dummy, 4, 1, f); fread(&dummy, 4, 1, f); fread(&dummy, 4, 1, f);
            fread(&width, 4, 1, f); fread(&height, 4, 1, f);
            *n = (int)frames; *w = (int)width; *h = (int)height;
            *fps = us_per_frame ? (int)(1000000u / us_per_frame) : 0;
            fclose(f);
            return 0;
        }
        fseek(f, (sz + 1) & ~1u, SEEK_CUR);
    }
    fclose(f);
    return -4;
}

/* read all frames into out (n*h*w*3, preallocated). returns frames read */
int read_mjpeg_avi(const char *path, uint8_t *out, int n, int h, int w) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    char tag[4];
    uint32_t sz;
    int idx = 0;
    fseek(f, 12, SEEK_SET);
    unsigned char *buf = NULL;
    unsigned long cap = 0;
    while (idx < n && fread(tag, 1, 4, f) == 4) {
        if (fread(&sz, 4, 1, f) != 1) break;
        if (!memcmp(tag, "LIST", 4)) { fseek(f, 4, SEEK_CUR); continue; }
        if (!memcmp(tag, "00dc", 4)) {
            if (sz > cap) { cap = sz; buf = realloc(buf, cap); }
            if (fread(buf, 1, sz, f) != sz) break;
            if (sz & 1) fseek(f, 1, SEEK_CUR);
            if (decode_frame(buf, sz, out + (size_t)idx * h * w * 3, w, h) == 0) idx++;
        } else {
            fseek(f, (sz + 1) & ~1u, SEEK_CUR);
        }
    }
    free(buf);
    fclose(f);
    return idx;
}

/* smelter_io: host-side codec/container service for the TPU-native smelter.
 *
 * C ABI over FFmpeg (libavformat/libavcodec/libswscale/libswresample) used by
 * the Python pipeline via ctypes. This is the TPU-stack equivalent of the
 * reference's codec layer: CPU decoders/encoders
 * (smelter-core/src/pipeline/{decoder,encoder}/ffmpeg_*.rs) and MP4/HLS
 * demux/mux (smelter-core/src/pipeline/{mp4,hls}/). The reference's
 * gpu-video Vulkan path has no TPU analogue (TPU hosts have no video ASIC
 * API), so the hot codec path is libx264/libvpx on the host, overlapped with
 * TPU compute by the Python pipeline.
 *
 * Conventions:
 *  - all functions return 0 (or a handle >= 0) on success, negative on error;
 *    sm_last_error() returns a thread-local message for the last failure.
 *  - video frames cross the ABI as planar YUV420P (3 pointers + strides);
 *    decoders convert to YUV420P via swscale when the codec emits another
 *    pix_fmt; encoders take YUV420P.
 *  - audio crosses as interleaved float32 at a caller-chosen rate/channels;
 *    swresample handles conversion both ways.
 *  - handles are process-global small ints guarded by a mutex; each wraps an
 *    independent FFmpeg object, safe to drive from one thread per handle.
 */
#ifndef SMELTER_IO_H
#define SMELTER_IO_H

#include <stdint.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

const char *sm_last_error(void);
/* Version/caps probe: returns bitmask: 1=h264dec 2=x264enc 4=vp8 8=vp9
 * 16=aacdec 32=aacenc 64=opusdec 128=opusenc */
uint32_t sm_caps(void);
void sm_set_log_level(int av_log_level);

/* ---------------- demuxer ---------------- */

typedef struct {
    int32_t index;          /* stream index */
    int32_t media_type;     /* 0=video 1=audio other=-1 */
    int32_t codec;          /* SM_CODEC_* */
    int32_t width, height;  /* video */
    int32_t sample_rate, channels; /* audio */
    double  duration_s;     /* <0 if unknown */
    double  fps;            /* <=0 if unknown */
    int32_t extradata_size;
} sm_stream_info;

enum {
    SM_CODEC_UNKNOWN = 0,
    SM_CODEC_H264 = 1,
    SM_CODEC_H265 = 2,
    SM_CODEC_VP8 = 3,
    SM_CODEC_VP9 = 4,
    SM_CODEC_AV1 = 5,
    SM_CODEC_AAC = 10,
    SM_CODEC_OPUS = 11,
};

enum { SM_PKT_KEYFRAME = 1, SM_PKT_CORRUPT = 2 };

int sm_demux_open(const char *url);
/* Open with an AVDictionary of protocol options (newline-separated "k=v"
 * pairs, may be NULL) and an interrupt callback armed (sm_demux_interrupt
 * aborts blocking network reads — the reference combines
 * input_with_interrupt + input_with_dictionary, hls_input.rs:583-605). */
int sm_demux_open2(const char *url, const char *options);
/* Request abort of any blocking I/O on this demuxer (thread-safe). */
int sm_demux_interrupt(int h);
/* 1 if the container reports no duration (live playlist), else 0. */
int sm_demux_is_live(int h);
int sm_demux_nb_streams(int h);
int sm_demux_stream_info(int h, int stream, sm_stream_info *out);
int sm_demux_extradata(int h, int stream, uint8_t *buf, int32_t cap);
/* Reads the next packet. Returns data size >=0, or -1 EOF, -2 error.
 * On success fills stream_index/pts_s/dts_s/flags and copies data into buf
 * (up to cap; if the packet exceeds cap returns -3 with required size in
 * *stream_index... instead it errors; use a 4MB buffer). */
int sm_demux_read(int h, int32_t *stream_index, double *pts_s, double *dts_s,
                  int32_t *flags, uint8_t *buf, int32_t cap);
int sm_demux_seek(int h, double pts_s);
int sm_demux_close(int h);

/* ---------------- video decoder ---------------- */

/* codec: SM_CODEC_*; extradata may be NULL. */
int sm_vdec_new(int32_t codec, const uint8_t *extradata, int32_t extradata_size);
int sm_vdec_send(int h, const uint8_t *data, int32_t size, double pts_s);
int sm_vdec_send_eof(int h);
/* Polls a decoded frame. Returns 1 if a frame was written, 0 if the decoder
 * needs more input, -1 on EOF (after send_eof), -2 on error.
 * Caller provides a buffer of cap bytes; frame is written as contiguous
 * YUV420P (Y then U then V, no padding). */
int sm_vdec_receive(int h, int32_t *width, int32_t *height, double *pts_s,
                    uint8_t *buf, int32_t cap);
int sm_vdec_close(int h);

/* ---------------- audio decoder ---------------- */

int sm_adec_new(int32_t codec, int32_t out_sample_rate, int32_t out_channels,
                const uint8_t *extradata, int32_t extradata_size,
                int32_t in_sample_rate, int32_t in_channels);
int sm_adec_send(int h, const uint8_t *data, int32_t size, double pts_s);
int sm_adec_send_eof(int h);
/* Returns number of samples-per-channel written (>0), 0 need-more, -1 EOF,
 * -2 error. Output: interleaved f32 at (out_sample_rate, out_channels). */
int sm_adec_receive(int h, double *pts_s, float *buf, int32_t cap_samples);
int sm_adec_close(int h);

/* ---------------- video encoder ---------------- */

/* preset: x264 preset string ("ultrafast".."veryslow") for H264, ignored for
 * VPx. bitrate<=0 uses CRF/default. */
int sm_venc_new(int32_t codec, int32_t width, int32_t height,
                int32_t fps_num, int32_t fps_den, const char *preset,
                int64_t bitrate, const char *opts);
/* Returns extradata (avcC/etc) for muxing. */
int sm_venc_extradata(int h, uint8_t *buf, int32_t cap);
int sm_venc_send(int h, const uint8_t *yuv420, double pts_s, int32_t force_keyframe);
int sm_venc_send_eof(int h);
/* Returns packet size >0, 0 need-more, -1 EOF, -2 error. */
int sm_venc_receive(int h, double *pts_s, double *dts_s, int32_t *flags,
                    uint8_t *buf, int32_t cap);
int sm_venc_close(int h);

/* ---------------- audio encoder ---------------- */

/* in_sample_rate: rate of the PCM handed to sm_aenc_send (0 = same as
 * sample_rate); the encoder resamples internally (reference
 * encoder/resampler.rs). */
int sm_aenc_new(int32_t codec, int32_t sample_rate, int32_t channels,
                int64_t bitrate, int32_t in_sample_rate, const char *opts);
int sm_aenc_extradata(int h, uint8_t *buf, int32_t cap);
int sm_aenc_frame_size(int h); /* samples per channel per frame, 0 if any */
int sm_aenc_send(int h, const float *interleaved, int32_t n_samples, double pts_s);
int sm_aenc_send_eof(int h);
int sm_aenc_receive(int h, double *pts_s, double *dts_s, int32_t *flags,
                    uint8_t *buf, int32_t cap);
int sm_aenc_close(int h);

/* ---------------- muxer ---------------- */

/* format: "mp4", "hls", "mpegts", ... NULL = derive from url. */
int sm_mux_open(const char *url, const char *format, const char *opts);
int sm_mux_add_video(int h, int32_t codec, int32_t width, int32_t height,
                     int32_t fps_num, int32_t fps_den,
                     const uint8_t *extradata, int32_t extradata_size);
int sm_mux_add_audio(int h, int32_t codec, int32_t sample_rate, int32_t channels,
                     const uint8_t *extradata, int32_t extradata_size);
int sm_mux_write_header(int h);
int sm_mux_write(int h, int32_t stream, const uint8_t *data, int32_t size,
                 double pts_s, double dts_s, int32_t flags);
int sm_mux_close(int h);

#ifdef __cplusplus
}
#endif
#endif /* SMELTER_IO_H */

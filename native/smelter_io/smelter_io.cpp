/* smelter_io implementation. See smelter_io.h for the ABI contract.
 *
 * Design notes: each handle owns its FFmpeg objects and is driven from a
 * single pipeline thread (matching the reference's one-thread-per-codec
 * model, smelter-core/src/pipeline/decoder/decoder_thread_video.rs). The
 * handle table itself is mutex-guarded so handles can be created/destroyed
 * from any thread.
 */
#include "smelter_io.h"

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libavutil/channel_layout.h>
#include <libswscale/swscale.h>
#include <libswresample/swresample.h>
}

#include <cstring>
#include <cstdio>
#include <atomic>
#include <memory>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

thread_local std::string g_error;

int fail(const std::string &msg) {
    g_error = msg;
    return -2;
}

int fail_av(const std::string &what, int err) {
    char buf[256];
    av_strerror(err, buf, sizeof(buf));
    g_error = what + ": " + buf;
    return -2;
}

AVCodecID to_av_codec(int32_t c) {
    switch (c) {
        case SM_CODEC_H264: return AV_CODEC_ID_H264;
        case SM_CODEC_H265: return AV_CODEC_ID_HEVC;
        case SM_CODEC_AV1: return AV_CODEC_ID_AV1;
        case SM_CODEC_VP8: return AV_CODEC_ID_VP8;
        case SM_CODEC_VP9: return AV_CODEC_ID_VP9;
        case SM_CODEC_AAC: return AV_CODEC_ID_AAC;
        case SM_CODEC_OPUS: return AV_CODEC_ID_OPUS;
        default: return AV_CODEC_ID_NONE;
    }
}

int32_t from_av_codec(AVCodecID id) {
    switch (id) {
        case AV_CODEC_ID_H264: return SM_CODEC_H264;
        case AV_CODEC_ID_HEVC: return SM_CODEC_H265;
        case AV_CODEC_ID_AV1: return SM_CODEC_AV1;
        case AV_CODEC_ID_VP8: return SM_CODEC_VP8;
        case AV_CODEC_ID_VP9: return SM_CODEC_VP9;
        case AV_CODEC_ID_AAC: return SM_CODEC_AAC;
        case AV_CODEC_ID_OPUS: return SM_CODEC_OPUS;
        default: return SM_CODEC_UNKNOWN;
    }
}

/* handle table */
template <typename T>
struct Table {
    std::mutex mu;
    std::unordered_map<int, std::unique_ptr<T>> items;
    int next = 1;

    int put(std::unique_ptr<T> v) {
        std::lock_guard<std::mutex> lk(mu);
        int h = next++;
        items[h] = std::move(v);
        return h;
    }
    T *get(int h) {
        std::lock_guard<std::mutex> lk(mu);
        auto it = items.find(h);
        return it == items.end() ? nullptr : it->second.get();
    }
    bool erase(int h) {
        std::lock_guard<std::mutex> lk(mu);
        return items.erase(h) > 0;
    }
};

constexpr AVRational SM_TB{1, 90000}; /* internal fixed timebase (RTP-like) */

double ts_to_s(int64_t ts, AVRational tb) {
    if (ts == AV_NOPTS_VALUE) return -1e18;
    return ts * av_q2d(tb);
}

int64_t s_to_ts(double s, AVRational tb) {
    return (int64_t)(s / av_q2d(tb) + (s >= 0 ? 0.5 : -0.5));
}

/* ---------------- demuxer ---------------- */

struct Demux {
    AVFormatContext *fmt = nullptr;
    AVPacket *pkt = nullptr;
    /* heap-allocated so its address is stable for the AVIO interrupt
     * callback even while the Demux lives in a unique_ptr table slot */
    std::shared_ptr<std::atomic<int>> interrupted =
        std::make_shared<std::atomic<int>>(0);
    ~Demux() {
        if (pkt) av_packet_free(&pkt);
        if (fmt) avformat_close_input(&fmt);
    }
};

static int demux_interrupt_cb(void *opaque) {
    return ((std::atomic<int> *)opaque)->load(std::memory_order_relaxed);
}

Table<Demux> g_demux;

/* ---------------- video decoder ---------------- */

struct VDec {
    AVCodecContext *ctx = nullptr;
    AVFrame *frame = nullptr;
    SwsContext *sws = nullptr;
    int sws_w = 0, sws_h = 0;
    AVPixelFormat sws_fmt = AV_PIX_FMT_NONE;
    ~VDec() {
        if (sws) sws_freeContext(sws);
        if (frame) av_frame_free(&frame);
        if (ctx) avcodec_free_context(&ctx);
    }
};

Table<VDec> g_vdec;

/* ---------------- audio decoder ---------------- */

struct ADec {
    AVCodecContext *ctx = nullptr;
    AVFrame *frame = nullptr;
    SwrContext *swr = nullptr;
    int out_rate = 48000, out_ch = 2;
    ~ADec() {
        if (swr) swr_free(&swr);
        if (frame) av_frame_free(&frame);
        if (ctx) avcodec_free_context(&ctx);
    }
};

Table<ADec> g_adec;

/* ---------------- video encoder ---------------- */

struct VEnc {
    AVCodecContext *ctx = nullptr;
    AVFrame *frame = nullptr;
    AVPacket *pkt = nullptr;
    int64_t frame_index = 0;
    ~VEnc() {
        if (pkt) av_packet_free(&pkt);
        if (frame) av_frame_free(&frame);
        if (ctx) avcodec_free_context(&ctx);
    }
};

Table<VEnc> g_venc;

/* ---------------- audio encoder ---------------- */

struct AEncPkt {
    std::vector<uint8_t> data;
    int64_t pts, dts;
    int flags;
};

struct AEnc {
    AVCodecContext *ctx = nullptr;
    AVFrame *frame = nullptr;
    AVPacket *pkt = nullptr;
    SwrContext *swr = nullptr;       /* FLT interleaved -> encoder fmt */
    SwrContext *swr_rate = nullptr;  /* in_rate -> out_rate, FLT -> FLT */
    /* FIFO of interleaved f32 samples awaiting a full encoder frame */
    std::vector<float> fifo;
    /* encoded packets staged so send never stalls on EAGAIN */
    std::vector<AEncPkt> outq;
    size_t outq_head = 0;
    double next_pts_s = 0;
    bool pts_set = false;
    ~AEnc() {
        if (swr_rate) swr_free(&swr_rate);
        if (swr) swr_free(&swr);
        if (pkt) av_packet_free(&pkt);
        if (frame) av_frame_free(&frame);
        if (ctx) avcodec_free_context(&ctx);
    }
};

Table<AEnc> g_aenc;

/* ---------------- muxer ---------------- */

struct Mux {
    AVFormatContext *fmt = nullptr;
    AVPacket *pkt = nullptr;
    bool header_written = false;
    std::string opts;
    ~Mux() {
        if (pkt) av_packet_free(&pkt);
        if (fmt) {
            if (header_written) av_write_trailer(fmt);
            if (!(fmt->oformat->flags & AVFMT_NOFILE) && fmt->pb)
                avio_closep(&fmt->pb);
            avformat_free_context(fmt);
        }
    }
};

Table<Mux> g_mux;

} // namespace

extern "C" {

const char *sm_last_error(void) { return g_error.c_str(); }

void sm_set_log_level(int level) { av_log_set_level(level); }

uint32_t sm_caps(void) {
    uint32_t caps = 0;
    if (avcodec_find_decoder(AV_CODEC_ID_H264)) caps |= 1;
    if (avcodec_find_encoder(AV_CODEC_ID_H264)) caps |= 2;
    if (avcodec_find_decoder(AV_CODEC_ID_VP8) && avcodec_find_encoder(AV_CODEC_ID_VP8)) caps |= 4;
    if (avcodec_find_decoder(AV_CODEC_ID_VP9) && avcodec_find_encoder(AV_CODEC_ID_VP9)) caps |= 8;
    if (avcodec_find_decoder(AV_CODEC_ID_AAC)) caps |= 16;
    if (avcodec_find_encoder(AV_CODEC_ID_AAC)) caps |= 32;
    if (avcodec_find_decoder(AV_CODEC_ID_OPUS)) caps |= 64;
    if (avcodec_find_encoder(AV_CODEC_ID_OPUS)) caps |= 128;
    return caps;
}

/* ---------------- demuxer ---------------- */

static int demux_open_impl(const char *url, const char *options) {
    auto d = std::make_unique<Demux>();
    /* interrupt callback must be armed before open so a stuck network
     * handshake is abortable (reference hls_input.rs:583-605) */
    d->fmt = avformat_alloc_context();
    if (!d->fmt) return fail("avformat_alloc_context");
    d->fmt->interrupt_callback.callback = demux_interrupt_cb;
    d->fmt->interrupt_callback.opaque = d->interrupted.get();
    AVDictionary *opts = nullptr;
    if (options && *options) {
        std::string s(options);
        size_t pos = 0;
        while (pos < s.size()) {
            size_t nl = s.find('\n', pos);
            if (nl == std::string::npos) nl = s.size();
            std::string kv = s.substr(pos, nl - pos);
            size_t eq = kv.find('=');
            if (eq != std::string::npos)
                av_dict_set(&opts, kv.substr(0, eq).c_str(),
                            kv.substr(eq + 1).c_str(), 0);
            pos = nl + 1;
        }
    }
    int err = avformat_open_input(&d->fmt, url, nullptr, &opts);
    av_dict_free(&opts);
    if (err < 0) { d->fmt = nullptr; return fail_av("avformat_open_input", err); }
    err = avformat_find_stream_info(d->fmt, nullptr);
    if (err < 0) return fail_av("find_stream_info", err);
    d->pkt = av_packet_alloc();
    return g_demux.put(std::move(d));
}

int sm_demux_open(const char *url) { return demux_open_impl(url, nullptr); }

int sm_demux_open2(const char *url, const char *options) {
    return demux_open_impl(url, options);
}

int sm_demux_interrupt(int h) {
    /* copy the interrupted shared_ptr out under the table mutex: a raw
     * Demux* from get() could be freed by a concurrent sm_demux_close
     * (reader thread closing at EOF while stop() interrupts) between the
     * lookup and the store — the shared_ptr copy keeps the atomic alive */
    std::shared_ptr<std::atomic<int>> flag;
    {
        std::lock_guard<std::mutex> lk(g_demux.mu);
        auto it = g_demux.items.find(h);
        if (it == g_demux.items.end()) return fail("bad demux handle");
        flag = it->second->interrupted;
    }
    flag->store(1, std::memory_order_relaxed);
    return 0;
}

int sm_demux_is_live(int h) {
    Demux *d = g_demux.get(h);
    if (!d) return fail("bad demux handle");
    return d->fmt->duration <= 0 ? 1 : 0;
}

int sm_demux_nb_streams(int h) {
    Demux *d = g_demux.get(h);
    if (!d) return fail("bad demux handle");
    return (int)d->fmt->nb_streams;
}

int sm_demux_stream_info(int h, int stream, sm_stream_info *out) {
    Demux *d = g_demux.get(h);
    if (!d) return fail("bad demux handle");
    if (stream < 0 || stream >= (int)d->fmt->nb_streams) return fail("bad stream index");
    AVStream *s = d->fmt->streams[stream];
    AVCodecParameters *p = s->codecpar;
    out->index = stream;
    out->media_type = p->codec_type == AVMEDIA_TYPE_VIDEO ? 0
                    : p->codec_type == AVMEDIA_TYPE_AUDIO ? 1 : -1;
    out->codec = from_av_codec(p->codec_id);
    out->width = p->width;
    out->height = p->height;
    out->sample_rate = p->sample_rate;
    out->channels = p->ch_layout.nb_channels;
    out->duration_s = s->duration != AV_NOPTS_VALUE
        ? s->duration * av_q2d(s->time_base)
        : (d->fmt->duration != AV_NOPTS_VALUE ? d->fmt->duration / (double)AV_TIME_BASE : -1.0);
    AVRational fr = s->avg_frame_rate;
    out->fps = (fr.num > 0 && fr.den > 0) ? av_q2d(fr) : 0.0;
    out->extradata_size = p->extradata_size;
    return 0;
}

int sm_demux_extradata(int h, int stream, uint8_t *buf, int32_t cap) {
    Demux *d = g_demux.get(h);
    if (!d) return fail("bad demux handle");
    if (stream < 0 || stream >= (int)d->fmt->nb_streams) return fail("bad stream index");
    AVCodecParameters *p = d->fmt->streams[stream]->codecpar;
    if (p->extradata_size > cap) return fail("extradata buffer too small");
    if (p->extradata_size > 0) memcpy(buf, p->extradata, p->extradata_size);
    return p->extradata_size;
}

int sm_demux_read(int h, int32_t *stream_index, double *pts_s, double *dts_s,
                  int32_t *flags, uint8_t *buf, int32_t cap) {
    Demux *d = g_demux.get(h);
    if (!d) return fail("bad demux handle");
    int err = av_read_frame(d->fmt, d->pkt);
    if (err == AVERROR_EOF) return -1;
    if (err < 0) return fail_av("av_read_frame", err);
    AVStream *s = d->fmt->streams[d->pkt->stream_index];
    *stream_index = d->pkt->stream_index;
    *pts_s = ts_to_s(d->pkt->pts, s->time_base);
    *dts_s = ts_to_s(d->pkt->dts, s->time_base);
    *flags = ((d->pkt->flags & AV_PKT_FLAG_KEY) ? SM_PKT_KEYFRAME : 0)
           | ((d->pkt->flags & AV_PKT_FLAG_CORRUPT) ? SM_PKT_CORRUPT : 0);
    int size = d->pkt->size;
    if (size > cap) {
        av_packet_unref(d->pkt);
        return fail("packet buffer too small");
    }
    memcpy(buf, d->pkt->data, size);
    av_packet_unref(d->pkt);
    return size;
}

int sm_demux_seek(int h, double pts_s) {
    Demux *d = g_demux.get(h);
    if (!d) return fail("bad demux handle");
    int64_t ts = (int64_t)(pts_s * AV_TIME_BASE);
    int err = av_seek_frame(d->fmt, -1, ts, AVSEEK_FLAG_BACKWARD);
    if (err < 0) return fail_av("av_seek_frame", err);
    return 0;
}

int sm_demux_close(int h) { return g_demux.erase(h) ? 0 : fail("bad demux handle"); }

/* ---------------- video decoder ---------------- */

int sm_vdec_new(int32_t codec, const uint8_t *extradata, int32_t extradata_size) {
    const AVCodec *c = avcodec_find_decoder(to_av_codec(codec));
    if (!c) return fail("decoder not found");
    auto v = std::make_unique<VDec>();
    v->ctx = avcodec_alloc_context3(c);
    if (!v->ctx) return fail("alloc codec ctx");
    if (extradata && extradata_size > 0) {
        v->ctx->extradata = (uint8_t *)av_mallocz(extradata_size + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(v->ctx->extradata, extradata, extradata_size);
        v->ctx->extradata_size = extradata_size;
    }
    v->ctx->thread_count = 0; /* auto */
    int err = avcodec_open2(v->ctx, c, nullptr);
    if (err < 0) return fail_av("avcodec_open2", err);
    v->frame = av_frame_alloc();
    return g_vdec.put(std::move(v));
}

int sm_vdec_send(int h, const uint8_t *data, int32_t size, double pts_s) {
    VDec *v = g_vdec.get(h);
    if (!v) return fail("bad vdec handle");
    AVPacket *pkt = av_packet_alloc();
    av_new_packet(pkt, size);
    memcpy(pkt->data, data, size);
    pkt->pts = s_to_ts(pts_s, SM_TB);
    pkt->dts = pkt->pts;
    int err = avcodec_send_packet(v->ctx, pkt);
    av_packet_free(&pkt);
    if (err == AVERROR(EAGAIN)) return 1; /* caller must drain receive first */
    if (err < 0) return fail_av("send_packet", err);
    return 0;
}

int sm_vdec_send_eof(int h) {
    VDec *v = g_vdec.get(h);
    if (!v) return fail("bad vdec handle");
    int err = avcodec_send_packet(v->ctx, nullptr);
    if (err < 0 && err != AVERROR_EOF) return fail_av("send_packet(eof)", err);
    return 0;
}

int sm_vdec_receive(int h, int32_t *width, int32_t *height, double *pts_s,
                    uint8_t *buf, int32_t cap) {
    VDec *v = g_vdec.get(h);
    if (!v) return fail("bad vdec handle");
    int err = avcodec_receive_frame(v->ctx, v->frame);
    if (err == AVERROR(EAGAIN)) return 0;
    if (err == AVERROR_EOF) return -1;
    if (err < 0) return fail_av("receive_frame", err);
    int w = v->frame->width, ht = v->frame->height;
    int need = w * ht + 2 * ((w / 2) * (ht / 2));
    if (need > cap) {
        av_frame_unref(v->frame);
        return fail("frame buffer too small");
    }
    uint8_t *dst[4] = {buf, buf + w * ht, buf + w * ht + (w / 2) * (ht / 2), nullptr};
    int dst_ls[4] = {w, w / 2, w / 2, 0};
    AVPixelFormat fmt = (AVPixelFormat)v->frame->format;
    if (fmt == AV_PIX_FMT_YUV420P || fmt == AV_PIX_FMT_YUVJ420P) {
        av_image_copy(dst, dst_ls, (const uint8_t **)v->frame->data,
                      v->frame->linesize, AV_PIX_FMT_YUV420P, w, ht);
    } else {
        if (!v->sws || v->sws_w != w || v->sws_h != ht || v->sws_fmt != fmt) {
            if (v->sws) sws_freeContext(v->sws);
            v->sws = sws_getContext(w, ht, fmt, w, ht, AV_PIX_FMT_YUV420P,
                                    SWS_BILINEAR, nullptr, nullptr, nullptr);
            v->sws_w = w; v->sws_h = ht; v->sws_fmt = fmt;
        }
        if (!v->sws) {
            av_frame_unref(v->frame);
            return fail("sws_getContext failed");
        }
        sws_scale(v->sws, v->frame->data, v->frame->linesize, 0, ht, dst, dst_ls);
    }
    *width = w;
    *height = ht;
    int64_t pts = v->frame->pts != AV_NOPTS_VALUE ? v->frame->pts
                                                  : v->frame->best_effort_timestamp;
    *pts_s = pts != AV_NOPTS_VALUE ? ts_to_s(pts, SM_TB) : -1e18;
    av_frame_unref(v->frame);
    return 1;
}

int sm_vdec_close(int h) { return g_vdec.erase(h) ? 0 : fail("bad vdec handle"); }

/* ---------------- audio decoder ---------------- */

int sm_adec_new(int32_t codec, int32_t out_sample_rate, int32_t out_channels,
                const uint8_t *extradata, int32_t extradata_size,
                int32_t in_sample_rate, int32_t in_channels) {
    const AVCodec *c = avcodec_find_decoder(to_av_codec(codec));
    if (!c) return fail("audio decoder not found");
    auto a = std::make_unique<ADec>();
    a->ctx = avcodec_alloc_context3(c);
    if (extradata && extradata_size > 0) {
        a->ctx->extradata = (uint8_t *)av_mallocz(extradata_size + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(a->ctx->extradata, extradata, extradata_size);
        a->ctx->extradata_size = extradata_size;
    }
    if (in_sample_rate > 0) a->ctx->sample_rate = in_sample_rate;
    if (in_channels > 0) av_channel_layout_default(&a->ctx->ch_layout, in_channels);
    a->out_rate = out_sample_rate;
    a->out_ch = out_channels;
    int err = avcodec_open2(a->ctx, c, nullptr);
    if (err < 0) return fail_av("avcodec_open2(audio)", err);
    a->frame = av_frame_alloc();
    return g_adec.put(std::move(a));
}

int sm_adec_send(int h, const uint8_t *data, int32_t size, double pts_s) {
    ADec *a = g_adec.get(h);
    if (!a) return fail("bad adec handle");
    AVPacket *pkt = av_packet_alloc();
    av_new_packet(pkt, size);
    memcpy(pkt->data, data, size);
    pkt->pts = s_to_ts(pts_s, SM_TB);
    int err = avcodec_send_packet(a->ctx, pkt);
    av_packet_free(&pkt);
    if (err == AVERROR(EAGAIN)) return 1;
    if (err < 0) return fail_av("send_packet(audio)", err);
    return 0;
}

int sm_adec_send_eof(int h) {
    ADec *a = g_adec.get(h);
    if (!a) return fail("bad adec handle");
    int err = avcodec_send_packet(a->ctx, nullptr);
    if (err < 0 && err != AVERROR_EOF) return fail_av("send_packet(audio eof)", err);
    return 0;
}

int sm_adec_receive(int h, double *pts_s, float *buf, int32_t cap_samples) {
    ADec *a = g_adec.get(h);
    if (!a) return fail("bad adec handle");
    int err = avcodec_receive_frame(a->ctx, a->frame);
    if (err == AVERROR(EAGAIN)) return 0;
    if (err == AVERROR_EOF) return -1;
    if (err < 0) return fail_av("receive_frame(audio)", err);
    if (!a->swr) {
        AVChannelLayout out_layout;
        av_channel_layout_default(&out_layout, a->out_ch);
        int serr = swr_alloc_set_opts2(&a->swr, &out_layout, AV_SAMPLE_FMT_FLT,
                                       a->out_rate, &a->frame->ch_layout,
                                       (AVSampleFormat)a->frame->format,
                                       a->frame->sample_rate, 0, nullptr);
        if (serr < 0 || swr_init(a->swr) < 0) {
            av_frame_unref(a->frame);
            return fail("swr init failed");
        }
    }
    int max_out = swr_get_out_samples(a->swr, a->frame->nb_samples);
    if (max_out > cap_samples) {
        av_frame_unref(a->frame);
        return fail("audio buffer too small");
    }
    uint8_t *out_planes[1] = {(uint8_t *)buf};
    int got = swr_convert(a->swr, out_planes, max_out,
                          (const uint8_t **)a->frame->extended_data,
                          a->frame->nb_samples);
    if (got < 0) {
        av_frame_unref(a->frame);
        return fail_av("swr_convert", got);
    }
    *pts_s = a->frame->pts != AV_NOPTS_VALUE ? ts_to_s(a->frame->pts, SM_TB) : -1e18;
    av_frame_unref(a->frame);
    return got;
}

int sm_adec_close(int h) { return g_adec.erase(h) ? 0 : fail("bad adec handle"); }

/* ---------------- video encoder ---------------- */

int sm_venc_new(int32_t codec, int32_t width, int32_t height,
                int32_t fps_num, int32_t fps_den, const char *preset,
                int64_t bitrate, const char *opts) {
    const AVCodec *c = nullptr;
    if (codec == SM_CODEC_H264) c = avcodec_find_encoder_by_name("libx264");
    if (!c) c = avcodec_find_encoder(to_av_codec(codec));
    if (!c) return fail("video encoder not found");
    auto v = std::make_unique<VEnc>();
    v->ctx = avcodec_alloc_context3(c);
    v->ctx->width = width;
    v->ctx->height = height;
    v->ctx->time_base = SM_TB;
    v->ctx->framerate = AVRational{fps_num, fps_den};
    v->ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    v->ctx->color_range = AVCOL_RANGE_MPEG;
    v->ctx->colorspace = AVCOL_SPC_BT709;
    v->ctx->color_primaries = AVCOL_PRI_BT709;
    v->ctx->color_trc = AVCOL_TRC_BT709;
    /* low-latency defaults matching the reference's realtime encoder config
       (smelter-core/src/pipeline/encoder/ffmpeg_h264.rs) */
    v->ctx->max_b_frames = 0;
    v->ctx->thread_count = 0; /* auto (frame/slice threads on multi-core) */
    v->ctx->gop_size = (int)(2.0 * fps_num / fps_den); /* 2s GOP */
    if (bitrate > 0) v->ctx->bit_rate = bitrate;
    v->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    AVDictionary *dict = nullptr;
    if (codec == SM_CODEC_H264) {
        av_dict_set(&dict, "preset", preset && *preset ? preset : "ultrafast", 0);
        av_dict_set(&dict, "tune", "zerolatency", 0);
        if (bitrate <= 0) av_dict_set(&dict, "crf", "23", 0);
    } else {
        /* libvpx realtime */
        av_dict_set(&dict, "deadline", "realtime", 0);
        av_dict_set(&dict, "cpu-used", "8", 0);
        if (bitrate <= 0) v->ctx->bit_rate = (int64_t)width * height * 4;
    }
    if (opts && *opts) av_dict_parse_string(&dict, opts, "=", ",", 0);
    /* "pix_fmt=yuv422p|yuv444p" selects the encode chroma format (reference
       FfmpegH264Encoder.pixel_format); the caller sends matching planes */
    AVDictionaryEntry *pf = av_dict_get(dict, "pix_fmt", nullptr, 0);
    if (pf && pf->value) {
        if (!strcmp(pf->value, "yuv422p")) v->ctx->pix_fmt = AV_PIX_FMT_YUV422P;
        else if (!strcmp(pf->value, "yuv444p")) v->ctx->pix_fmt = AV_PIX_FMT_YUV444P;
        else if (!strcmp(pf->value, "yuv420p")) v->ctx->pix_fmt = AV_PIX_FMT_YUV420P;
        else return fail("unsupported pix_fmt option");
        av_dict_set(&dict, "pix_fmt", nullptr, 0);
    }
    /* "global_header=0" keeps SPS/PPS inline in the bitstream (needed for
       RTP/RTMP live streams); default (1) moves them to extradata for MP4 */
    AVDictionaryEntry *gh = av_dict_get(dict, "global_header", nullptr, 0);
    if (gh) {
        if (gh->value && gh->value[0] == '0')
            v->ctx->flags &= ~AV_CODEC_FLAG_GLOBAL_HEADER;
        av_dict_set(&dict, "global_header", nullptr, 0);
    }
    int err = avcodec_open2(v->ctx, c, &dict);
    av_dict_free(&dict);
    if (err < 0) return fail_av("avcodec_open2(venc)", err);
    v->frame = av_frame_alloc();
    v->frame->format = v->ctx->pix_fmt;
    v->frame->width = width;
    v->frame->height = height;
    err = av_frame_get_buffer(v->frame, 0);
    if (err < 0) return fail_av("frame_get_buffer", err);
    v->pkt = av_packet_alloc();
    return g_venc.put(std::move(v));
}

int sm_venc_extradata(int h, uint8_t *buf, int32_t cap) {
    VEnc *v = g_venc.get(h);
    if (!v) return fail("bad venc handle");
    if (v->ctx->extradata_size > cap) return fail("extradata buffer too small");
    if (v->ctx->extradata_size > 0) memcpy(buf, v->ctx->extradata, v->ctx->extradata_size);
    return v->ctx->extradata_size;
}

int sm_venc_send(int h, const uint8_t *yuv420, double pts_s, int32_t force_keyframe) {
    VEnc *v = g_venc.get(h);
    if (!v) return fail("bad venc handle");
    int err = av_frame_make_writable(v->frame);
    if (err < 0) return fail_av("frame_make_writable", err);
    int w = v->ctx->width, ht = v->ctx->height;
    int cw = w, chh = ht;  /* chroma plane dims per the encode pix fmt */
    if (v->ctx->pix_fmt == AV_PIX_FMT_YUV420P) { cw = w / 2; chh = ht / 2; }
    else if (v->ctx->pix_fmt == AV_PIX_FMT_YUV422P) { cw = w / 2; }
    const uint8_t *src[4] = {yuv420, yuv420 + w * ht,
                             yuv420 + w * ht + cw * chh, nullptr};
    int src_ls[4] = {w, cw, cw, 0};
    av_image_copy(v->frame->data, v->frame->linesize, src, src_ls,
                  v->ctx->pix_fmt, w, ht);
    v->frame->pts = s_to_ts(pts_s, SM_TB);
    v->frame->pict_type = force_keyframe ? AV_PICTURE_TYPE_I : AV_PICTURE_TYPE_NONE;
    err = avcodec_send_frame(v->ctx, v->frame);
    if (err == AVERROR(EAGAIN)) return 1;
    if (err < 0) return fail_av("send_frame", err);
    return 0;
}

int sm_venc_send_eof(int h) {
    VEnc *v = g_venc.get(h);
    if (!v) return fail("bad venc handle");
    int err = avcodec_send_frame(v->ctx, nullptr);
    if (err < 0 && err != AVERROR_EOF) return fail_av("send_frame(eof)", err);
    return 0;
}

int sm_venc_receive(int h, double *pts_s, double *dts_s, int32_t *flags,
                    uint8_t *buf, int32_t cap) {
    VEnc *v = g_venc.get(h);
    if (!v) return fail("bad venc handle");
    int err = avcodec_receive_packet(v->ctx, v->pkt);
    if (err == AVERROR(EAGAIN)) return 0;
    if (err == AVERROR_EOF) return -1;
    if (err < 0) return fail_av("receive_packet", err);
    int size = v->pkt->size;
    if (size > cap) {
        av_packet_unref(v->pkt);
        return fail("packet buffer too small");
    }
    memcpy(buf, v->pkt->data, size);
    *pts_s = ts_to_s(v->pkt->pts, SM_TB);
    *dts_s = ts_to_s(v->pkt->dts, SM_TB);
    *flags = (v->pkt->flags & AV_PKT_FLAG_KEY) ? SM_PKT_KEYFRAME : 0;
    av_packet_unref(v->pkt);
    return size;
}

int sm_venc_close(int h) { return g_venc.erase(h) ? 0 : fail("bad venc handle"); }

/* ---------------- audio encoder ---------------- */

int sm_aenc_new(int32_t codec, int32_t sample_rate, int32_t channels,
                int64_t bitrate, int32_t in_sample_rate, const char *opts) {
    const AVCodec *c = nullptr;
    if (codec == SM_CODEC_OPUS) c = avcodec_find_encoder_by_name("libopus");
    if (!c) c = avcodec_find_encoder(to_av_codec(codec));
    if (!c) return fail("audio encoder not found");
    auto a = std::make_unique<AEnc>();
    a->ctx = avcodec_alloc_context3(c);
    a->ctx->sample_rate = sample_rate;
    av_channel_layout_default(&a->ctx->ch_layout, channels);
    a->ctx->time_base = AVRational{1, sample_rate};
    a->ctx->bit_rate = bitrate > 0 ? bitrate : 128000;
    a->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    /* pick a supported sample format, prefer FLT then FLTP */
    const enum AVSampleFormat *fmts = c->sample_fmts;
    AVSampleFormat pick = AV_SAMPLE_FMT_NONE;
    if (fmts) {
        for (const enum AVSampleFormat *f = fmts; *f != AV_SAMPLE_FMT_NONE; ++f)
            if (*f == AV_SAMPLE_FMT_FLT) pick = *f;
        if (pick == AV_SAMPLE_FMT_NONE)
            for (const enum AVSampleFormat *f = fmts; *f != AV_SAMPLE_FMT_NONE; ++f)
                if (*f == AV_SAMPLE_FMT_FLTP) pick = *f;
        if (pick == AV_SAMPLE_FMT_NONE) pick = fmts[0];
    } else {
        pick = AV_SAMPLE_FMT_FLT;
    }
    a->ctx->sample_fmt = pick;
    /* codec-private options, e.g. libopus "fec=1,packet_loss=10,
       application=voip" (reference OpusEncoderOptions fields) */
    AVDictionary *dict = nullptr;
    if (opts && *opts) av_dict_parse_string(&dict, opts, "=", ",", 0);
    int err = avcodec_open2(a->ctx, c, &dict);
    av_dict_free(&dict);
    if (err < 0) return fail_av("avcodec_open2(aenc)", err);
    a->pkt = av_packet_alloc();
    a->frame = av_frame_alloc();
    a->frame->format = a->ctx->sample_fmt;
    av_channel_layout_copy(&a->frame->ch_layout, &a->ctx->ch_layout);
    a->frame->sample_rate = sample_rate;
    /* interleaved f32 in → encoder sample_fmt via swr */
    AVChannelLayout in_layout;
    av_channel_layout_default(&in_layout, channels);
    err = swr_alloc_set_opts2(&a->swr, &a->ctx->ch_layout, a->ctx->sample_fmt,
                              sample_rate, &in_layout, AV_SAMPLE_FMT_FLT,
                              sample_rate, 0, nullptr);
    if (err < 0 || swr_init(a->swr) < 0) return fail("swr init (aenc) failed");
    if (in_sample_rate > 0 && in_sample_rate != sample_rate) {
        err = swr_alloc_set_opts2(&a->swr_rate, &in_layout, AV_SAMPLE_FMT_FLT,
                                  sample_rate, &in_layout, AV_SAMPLE_FMT_FLT,
                                  in_sample_rate, 0, nullptr);
        if (err < 0 || swr_init(a->swr_rate) < 0)
            return fail("swr init (aenc rate) failed");
    }
    return g_aenc.put(std::move(a));
}

int sm_aenc_extradata(int h, uint8_t *buf, int32_t cap) {
    AEnc *a = g_aenc.get(h);
    if (!a) return fail("bad aenc handle");
    if (a->ctx->extradata_size > cap) return fail("extradata buffer too small");
    if (a->ctx->extradata_size > 0) memcpy(buf, a->ctx->extradata, a->ctx->extradata_size);
    return a->ctx->extradata_size;
}

int sm_aenc_frame_size(int h) {
    AEnc *a = g_aenc.get(h);
    if (!a) return fail("bad aenc handle");
    return a->ctx->frame_size;
}

namespace {

/* Moves any ready packets out of the codec into a->outq. Returns 0 or fails. */
int aenc_drain_to_queue(AEnc *a) {
    for (;;) {
        int err = avcodec_receive_packet(a->ctx, a->pkt);
        if (err == AVERROR(EAGAIN) || err == AVERROR_EOF) return 0;
        if (err < 0) return fail_av("receive_packet(aenc drain)", err);
        AEncPkt p;
        p.data.assign(a->pkt->data, a->pkt->data + a->pkt->size);
        p.pts = a->pkt->pts;
        p.dts = a->pkt->dts;
        p.flags = a->pkt->flags;
        a->outq.push_back(std::move(p));
        av_packet_unref(a->pkt);
    }
}

/* Encode exactly one frame of fs samples from the head of the fifo
   (padding with silence if pad && fifo shorter). */
int aenc_encode_one(AEnc *a, int fs, bool pad) {
    int ch = a->ctx->ch_layout.nb_channels;
    size_t need = (size_t)fs * ch;
    if (a->fifo.size() < need) {
        if (!pad) return 0;
        a->fifo.resize(need, 0.0f);
    }
    a->frame->nb_samples = fs;
    int err = av_frame_get_buffer(a->frame, 0);
    if (err < 0) return fail_av("frame_get_buffer(aenc)", err);
    const uint8_t *in_planes[1] = {(const uint8_t *)a->fifo.data()};
    int got = swr_convert(a->swr, a->frame->extended_data, fs, in_planes, fs);
    if (got < 0) {
        av_frame_unref(a->frame);
        return fail_av("swr_convert(aenc)", got);
    }
    a->frame->nb_samples = got;
    a->frame->pts = s_to_ts(a->next_pts_s, a->ctx->time_base);
    a->next_pts_s += (double)fs / a->ctx->sample_rate;
    err = avcodec_send_frame(a->ctx, a->frame);
    if (err == AVERROR(EAGAIN)) {
        /* free codec-side space, retry once */
        if (aenc_drain_to_queue(a) < 0) return -2;
        err = avcodec_send_frame(a->ctx, a->frame);
    }
    av_frame_unref(a->frame);
    a->frame->format = a->ctx->sample_fmt;
    av_channel_layout_copy(&a->frame->ch_layout, &a->ctx->ch_layout);
    a->frame->sample_rate = a->ctx->sample_rate;
    if (err < 0) return fail_av("send_frame(aenc)", err);
    a->fifo.erase(a->fifo.begin(), a->fifo.begin() + need);
    return 0;
}

} // namespace

int sm_aenc_send(int h, const float *interleaved, int32_t n_samples, double pts_s) {
    AEnc *a = g_aenc.get(h);
    if (!a) return fail("bad aenc handle");
    int ch = a->ctx->ch_layout.nb_channels;
    if (!a->pts_set) {
        a->next_pts_s = pts_s;
        a->pts_set = true;
    }
    if (a->swr_rate) {
        /* rate-convert first so the fifo holds out-rate samples */
        int max_out = swr_get_out_samples(a->swr_rate, n_samples);
        std::vector<float> conv((size_t)max_out * ch);
        uint8_t *outp[1] = {(uint8_t *)conv.data()};
        const uint8_t *inp[1] = {(const uint8_t *)interleaved};
        int got = swr_convert(a->swr_rate, outp, max_out, inp, n_samples);
        if (got < 0) return fail_av("swr_convert(aenc rate)", got);
        size_t old = a->fifo.size();
        a->fifo.resize(old + (size_t)got * ch);
        memcpy(a->fifo.data() + old, conv.data(), (size_t)got * ch * sizeof(float));
    } else {
        size_t old = a->fifo.size();
        a->fifo.resize(old + (size_t)n_samples * ch);
        memcpy(a->fifo.data() + old, interleaved,
               (size_t)n_samples * ch * sizeof(float));
    }
    int fs = a->ctx->frame_size > 0 ? a->ctx->frame_size
                                    : (int)(a->fifo.size() / ch);
    while (fs > 0 && (int)(a->fifo.size() / ch) >= fs) {
        if (aenc_encode_one(a, fs, false) < 0) return -2;
    }
    if (aenc_drain_to_queue(a) < 0) return -2;
    return 0;
}

int sm_aenc_send_eof(int h) {
    AEnc *a = g_aenc.get(h);
    if (!a) return fail("bad aenc handle");
    int fs = a->ctx->frame_size;
    if (fs > 0) {
        while (!a->fifo.empty()) {
            if (aenc_encode_one(a, fs, true) < 0) return -2;
        }
    }
    if (aenc_drain_to_queue(a) < 0) return -2;
    int err = avcodec_send_frame(a->ctx, nullptr);
    if (err < 0 && err != AVERROR_EOF) return fail_av("send_frame(aenc eof)", err);
    return 0;
}

int sm_aenc_receive(int h, double *pts_s, double *dts_s, int32_t *flags,
                    uint8_t *buf, int32_t cap) {
    AEnc *a = g_aenc.get(h);
    if (!a) return fail("bad aenc handle");
    if (a->outq_head < a->outq.size()) {
        AEncPkt &p = a->outq[a->outq_head];
        if ((int32_t)p.data.size() > cap) return fail("packet buffer too small");
        memcpy(buf, p.data.data(), p.data.size());
        *pts_s = ts_to_s(p.pts, a->ctx->time_base);
        *dts_s = ts_to_s(p.dts, a->ctx->time_base);
        *flags = (p.flags & AV_PKT_FLAG_KEY) ? SM_PKT_KEYFRAME : 0;
        int size = (int)p.data.size();
        if (++a->outq_head == a->outq.size()) {
            a->outq.clear();
            a->outq_head = 0;
        }
        return size;
    }
    int err = avcodec_receive_packet(a->ctx, a->pkt);
    if (err == AVERROR(EAGAIN)) return 0;
    if (err == AVERROR_EOF) return -1;
    if (err < 0) return fail_av("receive_packet(aenc)", err);
    int size = a->pkt->size;
    if (size > cap) {
        av_packet_unref(a->pkt);
        return fail("packet buffer too small");
    }
    memcpy(buf, a->pkt->data, size);
    *pts_s = ts_to_s(a->pkt->pts, a->ctx->time_base);
    *dts_s = ts_to_s(a->pkt->dts, a->ctx->time_base);
    *flags = (a->pkt->flags & AV_PKT_FLAG_KEY) ? SM_PKT_KEYFRAME : 0;
    av_packet_unref(a->pkt);
    return size;
}

int sm_aenc_close(int h) { return g_aenc.erase(h) ? 0 : fail("bad aenc handle"); }

/* ---------------- muxer ---------------- */

int sm_mux_open(const char *url, const char *format, const char *opts) {
    auto m = std::make_unique<Mux>();
    int err = avformat_alloc_output_context2(&m->fmt, nullptr,
                                             format && *format ? format : nullptr, url);
    if (err < 0 || !m->fmt) return fail_av("alloc_output_context", err);
    if (!(m->fmt->oformat->flags & AVFMT_NOFILE)) {
        err = avio_open(&m->fmt->pb, url, AVIO_FLAG_WRITE);
        if (err < 0) return fail_av("avio_open", err);
    }
    if (opts && *opts) m->opts = opts;
    m->pkt = av_packet_alloc();
    return g_mux.put(std::move(m));
}

static int mux_add_stream(Mux *m, int32_t codec, const uint8_t *extradata,
                          int32_t extradata_size, AVStream **out) {
    AVStream *s = avformat_new_stream(m->fmt, nullptr);
    if (!s) return fail("avformat_new_stream");
    s->codecpar->codec_id = to_av_codec(codec);
    if (extradata && extradata_size > 0) {
        s->codecpar->extradata =
            (uint8_t *)av_mallocz(extradata_size + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(s->codecpar->extradata, extradata, extradata_size);
        s->codecpar->extradata_size = extradata_size;
    }
    *out = s;
    return s->index;
}

int sm_mux_add_video(int h, int32_t codec, int32_t width, int32_t height,
                     int32_t fps_num, int32_t fps_den,
                     const uint8_t *extradata, int32_t extradata_size) {
    Mux *m = g_mux.get(h);
    if (!m) return fail("bad mux handle");
    AVStream *s = nullptr;
    int idx = mux_add_stream(m, codec, extradata, extradata_size, &s);
    if (idx < 0) return idx;
    s->codecpar->codec_type = AVMEDIA_TYPE_VIDEO;
    s->codecpar->width = width;
    s->codecpar->height = height;
    s->codecpar->format = AV_PIX_FMT_YUV420P;
    s->time_base = SM_TB;
    s->avg_frame_rate = AVRational{fps_num, fps_den};
    return idx;
}

int sm_mux_add_audio(int h, int32_t codec, int32_t sample_rate, int32_t channels,
                     const uint8_t *extradata, int32_t extradata_size) {
    Mux *m = g_mux.get(h);
    if (!m) return fail("bad mux handle");
    AVStream *s = nullptr;
    int idx = mux_add_stream(m, codec, extradata, extradata_size, &s);
    if (idx < 0) return idx;
    s->codecpar->codec_type = AVMEDIA_TYPE_AUDIO;
    s->codecpar->sample_rate = sample_rate;
    av_channel_layout_default(&s->codecpar->ch_layout, channels);
    s->time_base = AVRational{1, sample_rate};
    return idx;
}

int sm_mux_write_header(int h) {
    Mux *m = g_mux.get(h);
    if (!m) return fail("bad mux handle");
    AVDictionary *dict = nullptr;
    if (!m->opts.empty())
        av_dict_parse_string(&dict, m->opts.c_str(), "=", ",", 0);
    int err = avformat_write_header(m->fmt, &dict);
    av_dict_free(&dict);
    if (err < 0) return fail_av("write_header", err);
    m->header_written = true;
    return 0;
}

int sm_mux_write(int h, int32_t stream, const uint8_t *data, int32_t size,
                 double pts_s, double dts_s, int32_t flags) {
    Mux *m = g_mux.get(h);
    if (!m) return fail("bad mux handle");
    if (stream < 0 || stream >= (int)m->fmt->nb_streams) return fail("bad mux stream");
    AVStream *s = m->fmt->streams[stream];
    av_new_packet(m->pkt, size);
    memcpy(m->pkt->data, data, size);
    m->pkt->stream_index = stream;
    m->pkt->pts = s_to_ts(pts_s, s->time_base);
    m->pkt->dts = s_to_ts(dts_s > -1e17 ? dts_s : pts_s, s->time_base);
    if (m->pkt->dts > m->pkt->pts) m->pkt->dts = m->pkt->pts;
    m->pkt->flags = (flags & SM_PKT_KEYFRAME) ? AV_PKT_FLAG_KEY : 0;
    int err = av_interleaved_write_frame(m->fmt, m->pkt);
    av_packet_unref(m->pkt);
    if (err < 0) return fail_av("write_frame", err);
    return 0;
}

int sm_mux_close(int h) { return g_mux.erase(h) ? 0 : fail("bad mux handle"); }

/* linked FFmpeg library versions (AV_VERSION_INT packing), used by
 * tools/dependency_check.py — behavioral analogue of the reference's
 * FFmpeg version validation (tools/src/bin/dependency_check.rs) */
uint32_t sm_avcodec_version(void) { return avcodec_version(); }
uint32_t sm_avformat_version(void) { return avformat_version(); }
uint32_t sm_avutil_version(void) { return avutil_version(); }
uint32_t sm_swscale_version(void) { return swscale_version(); }
uint32_t sm_swresample_version(void) { return swresample_version(); }

} /* extern "C" */

// cvsim-av — native container I/O for cvsim_tpu, linked against the
// system FFmpeg libraries (libavformat/libavcodec/libavutil/libswscale/
// libswresample), the same layer the reference links in-process
// (ffmpeg_to_composite.cpp:34-53, 1966-2118).  The TPU pipelines speak
// Y4M / raw PCM over pipes; this tool is the bridge to real containers:
//
//   cvsim-av probe -i IN
//       one JSON line of stream info on stdout
//   cvsim-av decode -i IN [-pix 420|422] [-ts] [-frame-log F] [-pkt-log F]
//                   [-audio-pkt-log F]
//       decode best video stream -> Y4M on stdout.  -ts adds an in-band
//       "Xt=<pts90k>:<dur90k>" parameter to each FRAME marker (streaming-
//       safe VFR: the duration map arrives WITH the frame, not at EOF).
//       Sidecar logs feed the Python tools *real* container timestamps:
//         -frame-log      "rate 90000" + "<pts> <duration>" per frame in
//                         presentation order  (== the CLI's -video-pts-in
//                         VFR/telecine duration map,
//                         ffmpeg_to_composite.cpp:1641-1647 reordered_opaque)
//         -pkt-log        "<stream_index> <pts|none>" per packet in mux
//                         order              (== normalize-ts -pts-in)
//         -audio-pkt-log  "rate <hz>" + "<pts_samples|none> <nsamples>"
//                         per best-audio-stream packet (== -audio-pts-in,
//                         the A/V master-clock gap fill,
//                         ffmpeg_to_composite.cpp:1892-1915)
//   cvsim-av decode-audio -i IN -rate R -ch C
//       decode + resample best audio stream -> s16le interleaved on stdout
//   cvsim-av encode -o OUT [-wav W] [-crf N] [-crf-max N] [-preset P]
//                   [-vb BPS] [-interlaced] [-pts-log F]
//       Y4M on stdin -> H.264 (gop 15, no B-frames, 4:3 DAR) + PCM S16LE
//       in one container, the reference's output shape
//       (ffmpeg_to_composite.cpp:2034-2106).  -pts-log replays a
//       "rate <hz>" / "<pts> <duration>" frame log as the encode
//       timestamps (VFR-preserving mux).

#include <cstdarg>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libavutil/pixdesc.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

// FFmpeg 6/7 renamed the frame duration and interlace fields; keep 5.x
// (this image: 5.1) and 6+/7+ building from one source.
#if LIBAVUTIL_VERSION_MAJOR >= 58
#define FRAME_DURATION(f) ((f)->duration)
#else
#define FRAME_DURATION(f) ((f)->pkt_duration)
#endif
#ifdef AV_FRAME_FLAG_INTERLACED
#define FRAME_INTERLACED(f) (((f)->flags & AV_FRAME_FLAG_INTERLACED) != 0)
#define FRAME_TFF(f) (((f)->flags & AV_FRAME_FLAG_TOP_FIELD_FIRST) != 0)
#define SET_FRAME_INTERLACED(f, il, tff)                        \
  do {                                                          \
    if (il) (f)->flags |= AV_FRAME_FLAG_INTERLACED;             \
    if (tff) (f)->flags |= AV_FRAME_FLAG_TOP_FIELD_FIRST;       \
  } while (0)
#else
#define FRAME_INTERLACED(f) ((f)->interlaced_frame != 0)
#define FRAME_TFF(f) ((f)->top_field_first != 0)
#define SET_FRAME_INTERLACED(f, il, tff)    \
  do {                                      \
    (f)->interlaced_frame = (il) ? 1 : 0;   \
    (f)->top_field_first = (tff) ? 1 : 0;   \
  } while (0)
#endif

namespace {

[[noreturn]] void die(const char *fmt, ...) {
  va_list ap;
  va_start(ap, fmt);
  fprintf(stderr, "cvsim-av: ");
  vfprintf(stderr, fmt, ap);
  fprintf(stderr, "\n");
  va_end(ap);
  exit(1);
}

[[noreturn]] void die_av(const char *what, int err) {
  char buf[256];
  av_strerror(err, buf, sizeof buf);
  die("%s: %s", what, buf);
}

void check(int err, const char *what) {
  if (err < 0) die_av(what, err);
}

struct Args {
  std::string in, out, wav, frame_log, pkt_log, audio_pkt_log, pts_log;
  std::string pix = "420";
  std::string preset;
  int crf = 18, crf_max = -1, rate = 44100, ch = 2;
  long vb = 0;   // >0: ABR at this bit rate instead of crf (frameblend.cpp:794)
  bool interlaced = false, ts = false;
};

Args parse_args(int argc, char **argv) {
  Args a;
  for (int i = 0; i < argc; i++) {
    std::string f = argv[i];
    auto val = [&]() -> std::string {
      if (++i >= argc) die("flag %s needs a value", f.c_str());
      return argv[i];
    };
    if (f == "-i") a.in = val();
    else if (f == "-o") a.out = val();
    else if (f == "-wav") a.wav = val();
    else if (f == "-pix") a.pix = val();
    else if (f == "-crf") a.crf = atoi(val().c_str());
    else if (f == "-crf-max") a.crf_max = atoi(val().c_str());
    else if (f == "-vb") a.vb = atol(val().c_str());
    else if (f == "-preset") a.preset = val();
    else if (f == "-rate") a.rate = atoi(val().c_str());
    else if (f == "-ch") a.ch = atoi(val().c_str());
    else if (f == "-frame-log") a.frame_log = val();
    else if (f == "-pkt-log") a.pkt_log = val();
    else if (f == "-audio-pkt-log") a.audio_pkt_log = val();
    else if (f == "-pts-log") a.pts_log = val();
    else if (f == "-interlaced") a.interlaced = true;
    else if (f == "-ts") a.ts = true;
    else die("unknown flag %s", f.c_str());
  }
  return a;
}

FILE *open_log(const std::string &path) {
  if (path.empty()) return nullptr;
  FILE *f = fopen(path.c_str(), "w");
  if (!f) die("cannot open %s", path.c_str());
  return f;
}

AVFormatContext *open_input(const std::string &path) {
  AVFormatContext *fc = nullptr;
  check(avformat_open_input(&fc, path.c_str(), nullptr, nullptr),
        "open input");
  check(avformat_find_stream_info(fc, nullptr), "find stream info");
  return fc;
}

AVCodecContext *open_decoder(AVFormatContext *fc, int stream) {
  AVStream *st = fc->streams[stream];
  const AVCodec *dec = avcodec_find_decoder(st->codecpar->codec_id);
  if (!dec) die("no decoder for stream %d", stream);
  AVCodecContext *ctx = avcodec_alloc_context3(dec);
  check(avcodec_parameters_to_context(ctx, st->codecpar), "codec params");
  ctx->pkt_timebase = st->time_base;
  check(avcodec_open2(ctx, dec, nullptr), "open decoder");
  return ctx;
}

// ---------------------------------------------------------------- probe

int cmd_probe(const Args &a) {
  if (a.in.empty()) die("probe needs -i");
  AVFormatContext *fc = open_input(a.in);
  printf("{\"format\": \"%s\", \"duration_sec\": %.6f, \"streams\": [",
         fc->iformat->name,
         fc->duration > 0 ? fc->duration / (double)AV_TIME_BASE : -1.0);
  for (unsigned i = 0; i < fc->nb_streams; i++) {
    AVStream *st = fc->streams[i];
    AVCodecParameters *p = st->codecpar;
    const char *type = av_get_media_type_string(p->codec_type);
    const char *codec = avcodec_get_name(p->codec_id);
    if (i) printf(", ");
    printf("{\"index\": %u, \"type\": \"%s\", \"codec\": \"%s\"", i,
           type ? type : "?", codec);
    if (p->codec_type == AVMEDIA_TYPE_VIDEO) {
      AVRational fr = av_guess_frame_rate(fc, st, nullptr);
      printf(", \"width\": %d, \"height\": %d, \"fps\": \"%d:%d\""
             ", \"pix_fmt\": \"%s\"",
             p->width, p->height, fr.num, fr.den,
             av_get_pix_fmt_name((AVPixelFormat)p->format)
                 ? av_get_pix_fmt_name((AVPixelFormat)p->format) : "?");
    } else if (p->codec_type == AVMEDIA_TYPE_AUDIO) {
      printf(", \"sample_rate\": %d, \"channels\": %d", p->sample_rate,
             p->ch_layout.nb_channels);
    }
    printf(", \"time_base\": \"%d:%d\", \"nb_frames\": %lld}",
           st->time_base.num, st->time_base.den,
           (long long)st->nb_frames);
  }
  printf("]}\n");
  avformat_close_input(&fc);
  return 0;
}

// --------------------------------------------------------------- decode

struct Y4MOut {
  int w = 0, h = 0, ch = 0, cw = 0;
  bool wrote_header = false;

  void header(int width, int height, AVRational fps, char ilace,
              AVRational sar, bool is422) {
    w = width;
    h = height;
    ch = is422 ? h : h / 2;
    cw = w / 2;
    printf("YUV4MPEG2 W%d H%d F%d:%d I%c A%d:%d C%s\n", w, h,
           fps.num > 0 ? fps.num : 30000, fps.num > 0 ? fps.den : 1001,
           ilace, sar.num, sar.den, is422 ? "422" : "420jpeg");
    wrote_header = true;
  }

  void frame(const uint8_t *y, int ystride, const uint8_t *u, const uint8_t *v,
             int cstride, bool ts = false, int64_t pts90k = -1,
             int64_t dur90k = -1, bool has_pts = true) {
    // with ts, EVERY frame gets a marker — "n" means "no container
    // pts, extend by cadence" (a distinct token, NOT -1: real container
    // pts can be negative after rescale); omitting the marker would
    // desynchronize the consumer's frame-indexed duration map
    if (ts && !has_pts)
      printf("FRAME Xt=n:%lld\n", (long long)dur90k);
    else if (ts)
      printf("FRAME Xt=%lld:%lld\n", (long long)pts90k, (long long)dur90k);
    else
      fputs("FRAME\n", stdout);
    for (int r = 0; r < h; r++) fwrite(y + (size_t)r * ystride, 1, w, stdout);
    for (int r = 0; r < ch; r++) fwrite(u + (size_t)r * cstride, 1, cw, stdout);
    for (int r = 0; r < ch; r++) fwrite(v + (size_t)r * cstride, 1, cw, stdout);
  }
};

int cmd_decode(const Args &a) {
  if (a.in.empty()) die("decode needs -i");
  bool is422 = a.pix == "422";
  AVFormatContext *fc = open_input(a.in);
  int vidx = av_find_best_stream(fc, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (vidx < 0) die("no video stream in %s", a.in.c_str());
  int aidx = av_find_best_stream(fc, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  AVCodecContext *dec = open_decoder(fc, vidx);
  AVStream *vst = fc->streams[vidx];

  FILE *flog = open_log(a.frame_log);
  FILE *plog = open_log(a.pkt_log);
  FILE *alog = open_log(a.audio_pkt_log);
  if (flog) fprintf(flog, "rate 90000\n");
  int arate = 0;
  if (alog) {
    if (aidx < 0) die("-audio-pkt-log: no audio stream");
    arate = fc->streams[aidx]->codecpar->sample_rate;
    fprintf(alog, "rate %d\n", arate);
  }

  Y4MOut y4m;
  AVPixelFormat outfmt = is422 ? AV_PIX_FMT_YUV422P : AV_PIX_FMT_YUV420P;
  SwsContext *sws = nullptr;
  AVFrame *frame = av_frame_alloc(), *conv = av_frame_alloc();
  AVPacket *pkt = av_packet_alloc();
  AVRational fps = av_guess_frame_rate(fc, vst, nullptr);
  AVRational tb90k = {1, 90000};
  // fallback frame duration when the container carries none: 1/fps
  int64_t dur90k_cfr =
      fps.num > 0 ? av_rescale_q(1, av_inv_q(fps), tb90k) : 3003;

  auto emit = [&](AVFrame *f) {
    if (!y4m.wrote_header) {
      char ilace = FRAME_INTERLACED(f) ? (FRAME_TFF(f) ? 't' : 'b') : 'p';
      AVRational sar = f->sample_aspect_ratio.num > 0
                           ? f->sample_aspect_ratio
                           : (AVRational){0, 0};
      y4m.header(f->width, f->height, fps, ilace, sar, is422);
    }
    AVFrame *src = f;
    if (f->format != outfmt) {
      sws = sws_getCachedContext(sws, f->width, f->height,
                                 (AVPixelFormat)f->format, f->width,
                                 f->height, outfmt, SWS_BILINEAR, nullptr,
                                 nullptr, nullptr);
      conv->format = outfmt;
      conv->width = f->width;
      conv->height = f->height;
      av_frame_unref(conv);
      conv->format = outfmt;
      conv->width = f->width;
      conv->height = f->height;
      check(av_frame_get_buffer(conv, 0), "alloc conv frame");
      sws_scale(sws, f->data, f->linesize, 0, f->height, conv->data,
                conv->linesize);
      src = conv;
    }
    int64_t pts = f->best_effort_timestamp;
    int64_t p90 = pts == AV_NOPTS_VALUE
                      ? -1
                      : av_rescale_q(pts, vst->time_base, tb90k);
    int64_t d90 = FRAME_DURATION(f) > 0
                      ? av_rescale_q(FRAME_DURATION(f), vst->time_base,
                                     tb90k)
                      : dur90k_cfr;
    y4m.frame(src->data[0], src->linesize[0], src->data[1], src->data[2],
              src->linesize[1], a.ts, p90, d90, pts != AV_NOPTS_VALUE);
    if (flog) fprintf(flog, "%lld %lld\n", (long long)p90, (long long)d90);
  };

  auto drain = [&]() {
    while (avcodec_receive_frame(dec, frame) == 0) emit(frame);
  };

  while (av_read_frame(fc, pkt) >= 0) {
    if (plog) {
      if (pkt->pts == AV_NOPTS_VALUE)
        fprintf(plog, "%d none\n", pkt->stream_index);
      else
        fprintf(plog, "%d %lld\n", pkt->stream_index, (long long)pkt->pts);
    }
    if (alog && pkt->stream_index == aidx) {
      AVStream *ast = fc->streams[aidx];
      AVRational smp = {1, arate};
      int64_t ps = pkt->pts == AV_NOPTS_VALUE
                       ? -1
                       : av_rescale_q(pkt->pts, ast->time_base, smp);
      int64_t ns = pkt->duration > 0
                       ? av_rescale_q(pkt->duration, ast->time_base, smp)
                       : 0;
      if (ps < 0)
        fprintf(alog, "none %lld\n", (long long)ns);
      else
        fprintf(alog, "%lld %lld\n", (long long)ps, (long long)ns);
    }
    if (pkt->stream_index == vidx) {
      check(avcodec_send_packet(dec, pkt), "send packet");
      drain();
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(dec, nullptr);
  drain();

  for (FILE *f : {flog, plog, alog})
    if (f) fclose(f);
  fflush(stdout);
  av_packet_free(&pkt);
  av_frame_free(&frame);
  av_frame_free(&conv);
  sws_freeContext(sws);
  avcodec_free_context(&dec);
  avformat_close_input(&fc);
  return 0;
}

// --------------------------------------------------------- decode-audio

int cmd_decode_audio(const Args &a) {
  if (a.in.empty()) die("decode-audio needs -i");
  AVFormatContext *fc = open_input(a.in);
  int aidx = av_find_best_stream(fc, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (aidx < 0) die("no audio stream in %s", a.in.c_str());
  AVCodecContext *dec = open_decoder(fc, aidx);
  AVStream *ast = fc->streams[aidx];

  FILE *alog = open_log(a.audio_pkt_log);
  if (alog) fprintf(alog, "rate %d\n", dec->sample_rate);

  SwrContext *swr = nullptr;
  AVChannelLayout outlay;
  av_channel_layout_default(&outlay, a.ch);
  check(swr_alloc_set_opts2(&swr, &outlay, AV_SAMPLE_FMT_S16, a.rate,
                            &dec->ch_layout, dec->sample_fmt,
                            dec->sample_rate, 0, nullptr),
        "swr opts");
  check(swr_init(swr), "swr init");

  AVFrame *frame = av_frame_alloc();
  AVPacket *pkt = av_packet_alloc();
  std::vector<uint8_t> buf;

  auto emit = [&](AVFrame *f) {
    int max_out = swr_get_out_samples(swr, f ? f->nb_samples : 0);
    if (max_out <= 0) return;
    buf.resize((size_t)max_out * a.ch * 2);
    uint8_t *out = buf.data();
    int n = swr_convert(swr, &out, max_out,
                        f ? (const uint8_t **)f->extended_data : nullptr,
                        f ? f->nb_samples : 0);
    if (n > 0) fwrite(buf.data(), 2 * a.ch, n, stdout);
  };

  while (av_read_frame(fc, pkt) >= 0) {
    if (pkt->stream_index == aidx) {
      AVRational smp = {1, dec->sample_rate};
      int64_t log_pts = pkt->pts;
      // containers without packet durations (raw ADTS, some MPEG-TS)
      // would log n=0, which the pad-fill consumer reads as "this packet
      // contributes no samples" — instead attribute the samples the
      // decoder actually produces for this packet, the reference's own
      // decoded-frame accounting (ffmpeg_to_composite.cpp:1892-1915)
      int64_t ns = pkt->duration > 0
                       ? av_rescale_q(pkt->duration, ast->time_base, smp)
                       : -1;
      check(avcodec_send_packet(dec, pkt), "send packet");
      int64_t decoded = 0;
      while (avcodec_receive_frame(dec, frame) == 0) {
        decoded += frame->nb_samples;
        emit(frame);
      }
      if (alog) {
        if (ns < 0) ns = decoded;
        if (log_pts == AV_NOPTS_VALUE)
          fprintf(alog, "none %lld\n", (long long)ns);
        else
          fprintf(alog, "%lld %lld\n",
                  (long long)av_rescale_q(log_pts, ast->time_base, smp),
                  (long long)ns);
      }
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(dec, nullptr);
  while (avcodec_receive_frame(dec, frame) == 0) emit(frame);
  emit(nullptr);  // flush resampler tail

  if (alog) fclose(alog);
  fflush(stdout);
  av_packet_free(&pkt);
  av_frame_free(&frame);
  swr_free(&swr);
  av_channel_layout_uninit(&outlay);
  avcodec_free_context(&dec);
  avformat_close_input(&fc);
  return 0;
}

// --------------------------------------------------------------- encode

struct Y4MIn {
  int w = 0, h = 0, fn = 30000, fd = 1001, ch = 0, cw = 0;
  char ilace = 'p';
  bool is422 = false;

  void parse_header() {
    char line[512];
    if (!fgets(line, sizeof line, stdin)) die("empty y4m stream");
    if (strncmp(line, "YUV4MPEG2", 9)) die("not a YUV4MPEG2 stream");
    for (char *tok = strtok(line + 9, " \n"); tok;
         tok = strtok(nullptr, " \n")) {
      switch (tok[0]) {
        case 'W': w = atoi(tok + 1); break;
        case 'H': h = atoi(tok + 1); break;
        case 'F': sscanf(tok + 1, "%d:%d", &fn, &fd); break;
        case 'I': ilace = tok[1]; break;
        case 'C': is422 = !strncmp(tok + 1, "422", 3); break;
        default: break;
      }
    }
    if (!w || !h) die("missing W/H in y4m header");
    ch = is422 ? h : h / 2;
    cw = w / 2;
  }

  // reads one frame's planes into f (yuv420p/yuv422p); false at EOF
  bool read_frame(AVFrame *f) {
    char line[256];
    if (!fgets(line, sizeof line, stdin)) return false;
    if (strncmp(line, "FRAME", 5)) die("bad frame marker");
    auto plane = [&](uint8_t *dst, int stride, int rows, int cols) {
      for (int r = 0; r < rows; r++)
        if (fread(dst + (size_t)r * stride, 1, cols, stdin) != (size_t)cols)
          die("truncated y4m frame");
    };
    plane(f->data[0], f->linesize[0], h, w);
    plane(f->data[1], f->linesize[1], ch, cw);
    plane(f->data[2], f->linesize[2], ch, cw);
    return true;
  }
};

struct PtsLog {
  std::vector<std::pair<int64_t, int64_t>> entries;  // (pts, duration)
  int64_t rate = 90000;

  void load(const std::string &path) {
    FILE *f = fopen(path.c_str(), "r");
    if (!f) die("cannot open %s", path.c_str());
    char line[256];
    while (fgets(line, sizeof line, f)) {
      long long p, d;
      if (!strncmp(line, "rate ", 5)) rate = atoll(line + 5);
      else if (sscanf(line, "%lld %lld", &p, &d) == 2)
        entries.emplace_back(p, d);
    }
    fclose(f);
  }
};

int cmd_encode(const Args &a) {
  if (a.out.empty()) die("encode needs -o");
  Y4MIn in;
  in.parse_header();

  PtsLog plog;
  if (!a.pts_log.empty()) plog.load(a.pts_log);
  bool vfr = !plog.entries.empty();

  AVFormatContext *oc = nullptr;
  check(avformat_alloc_output_context2(&oc, nullptr, nullptr, a.out.c_str()),
        "alloc output");

  // -- video: H.264, gop 15, no B-frames, 4:3 DAR (the reference's
  //    output stream shape, ffmpeg_to_composite.cpp:2067-2106)
  const AVCodec *venc = avcodec_find_encoder_by_name("libx264");
  if (!venc) venc = avcodec_find_encoder(AV_CODEC_ID_H264);
  if (!venc) die("no H.264 encoder available");
  AVCodecContext *vc = avcodec_alloc_context3(venc);
  vc->width = in.w;
  vc->height = in.h;
  vc->pix_fmt = in.is422 ? AV_PIX_FMT_YUV422P : AV_PIX_FMT_YUV420P;
  vc->time_base = vfr ? (AVRational){1, (int)plog.rate}
                      : (AVRational){in.fd, in.fn};
  vc->framerate = {in.fn, in.fd};
  vc->gop_size = 15;
  vc->max_b_frames = 0;
  vc->thread_count = 0;   // auto frame-threading: the encoder otherwise
                          // serializes the whole tool at ~16 ms/frame SD
  // 4:3 display aspect: SAR = DAR * H / W
  vc->sample_aspect_ratio = av_d2q(4.0 * in.h / (3.0 * in.w), 4096);
  if (a.interlaced || in.ilace == 't' || in.ilace == 'b')
    vc->flags |= AV_CODEC_FLAG_INTERLACED_DCT | AV_CODEC_FLAG_INTERLACED_ME;
  if (oc->oformat->flags & AVFMT_GLOBALHEADER)
    vc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (a.vb > 0) {
    vc->bit_rate = a.vb;   // ABR, x264 default preset (frameblend.cpp:794)
  } else {
    char crfs[16];
    snprintf(crfs, sizeof crfs, "%d", a.crf);
    av_opt_set(vc->priv_data, "crf", crfs, 0);
    if (a.crf_max >= 0) {
      snprintf(crfs, sizeof crfs, "%d", a.crf_max);
      av_opt_set(vc->priv_data, "crf_max", crfs, 0);
    }
  }
  if (!a.preset.empty()) av_opt_set(vc->priv_data, "preset", a.preset.c_str(), 0);
  check(avcodec_open2(vc, venc, nullptr), "open video encoder");
  AVStream *vs = avformat_new_stream(oc, nullptr);
  check(avcodec_parameters_from_context(vs->codecpar, vc), "video params");
  vs->time_base = vc->time_base;
  vs->sample_aspect_ratio = vc->sample_aspect_ratio;
  // record the nominal rate: containers with coarse timebases (mkv: 1ms)
  // would otherwise make demuxers guess a rounded rate (e.g. 359/12)
  vs->avg_frame_rate = vc->framerate;

  // -- audio: decode the processed WAV, re-encode PCM S16LE alongside
  //    (ffmpeg_to_composite.cpp:2034-2065)
  AVFormatContext *wfc = nullptr;
  AVCodecContext *wdec = nullptr, *ac = nullptr;
  AVStream *as = nullptr;
  int widx = -1;
  if (!a.wav.empty()) {
    wfc = open_input(a.wav);
    widx = av_find_best_stream(wfc, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
    if (widx < 0) die("no audio stream in %s", a.wav.c_str());
    wdec = open_decoder(wfc, widx);
    const AVCodec *aenc = avcodec_find_encoder(AV_CODEC_ID_PCM_S16LE);
    ac = avcodec_alloc_context3(aenc);
    ac->sample_rate = wdec->sample_rate;
    check(av_channel_layout_copy(&ac->ch_layout, &wdec->ch_layout),
          "ch layout");
    ac->sample_fmt = AV_SAMPLE_FMT_S16;
    ac->time_base = {1, ac->sample_rate};
    if (oc->oformat->flags & AVFMT_GLOBALHEADER)
      ac->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    check(avcodec_open2(ac, aenc, nullptr), "open audio encoder");
    as = avformat_new_stream(oc, nullptr);
    check(avcodec_parameters_from_context(as->codecpar, ac), "audio params");
    as->time_base = ac->time_base;
  }

  if (!(oc->oformat->flags & AVFMT_NOFILE))
    check(avio_open(&oc->pb, a.out.c_str(), AVIO_FLAG_WRITE), "open file");
  check(avformat_write_header(oc, nullptr), "write header");

  AVPacket *opkt = av_packet_alloc();
  auto mux_from = [&](AVCodecContext *ctx, AVStream *st) {
    while (avcodec_receive_packet(ctx, opkt) == 0) {
      av_packet_rescale_ts(opkt, ctx->time_base, st->time_base);
      opkt->stream_index = st->index;
      check(av_interleaved_write_frame(oc, opkt), "write frame");
    }
  };

  // audio pump: encode WAV samples up to video time t (in seconds);
  // -shortest semantics — audio past the video end is dropped
  AVPacket *wpkt = av_packet_alloc();
  AVFrame *wframe = av_frame_alloc();
  bool wav_eof = a.wav.empty();
  double audio_t = 0.0;
  auto pump_audio = [&](double until_sec) {
    while (!wav_eof && audio_t < until_sec) {
      int rc = av_read_frame(wfc, wpkt);
      if (rc < 0) {
        wav_eof = true;
        break;
      }
      if (wpkt->stream_index != widx) {
        av_packet_unref(wpkt);
        continue;
      }
      check(avcodec_send_packet(wdec, wpkt), "send wav packet");
      av_packet_unref(wpkt);
      while (avcodec_receive_frame(wdec, wframe) == 0) {
        wframe->pts = av_rescale_q(
            (int64_t)(audio_t * ac->sample_rate + 0.5),
            (AVRational){1, ac->sample_rate}, ac->time_base);
        audio_t += wframe->nb_samples / (double)ac->sample_rate;
        check(avcodec_send_frame(ac, wframe), "send audio frame");
        mux_from(ac, as);
      }
    }
  };

  AVFrame *vf = av_frame_alloc();
  vf->format = vc->pix_fmt;
  vf->width = in.w;
  vf->height = in.h;
  check(av_frame_get_buffer(vf, 0), "alloc video frame");
  bool tff = a.interlaced || in.ilace == 't';
  bool ilaced = a.interlaced || in.ilace == 't' || in.ilace == 'b';

  int64_t n = 0;
  double video_t = 0.0;
  double last_dur_t = 0.0;  // VFR: last frame's duration in seconds
  while (true) {
    check(av_frame_make_writable(vf), "frame writable");
    if (!in.read_frame(vf)) break;
    if (vfr) {
      // rebase to the log's first entry: a raw demuxer log can start at a
      // large container offset (MPEG-TS), while the audio clock below is
      // 0-based — absolute pts would push the video `video_t` seconds
      // ahead and pump the whole WAV out at the first frame
      int64_t base = plog.entries.front().first;
      auto &e = n < (int64_t)plog.entries.size()
                    ? plog.entries[n]
                    : plog.entries.back();
      vf->pts = (n < (int64_t)plog.entries.size()
                     ? e.first
                     : plog.entries.back().first +
                           (n - (int64_t)plog.entries.size() + 1) * e.second)
                - base;
      video_t = vf->pts / (double)plog.rate;
      last_dur_t = e.second / (double)plog.rate;
    } else {
      vf->pts = n;
      video_t = n * in.fd / (double)in.fn;
    }
    SET_FRAME_INTERLACED(vf, ilaced, tff);
    pump_audio(video_t);
    check(avcodec_send_frame(vc, vf), "send video frame");
    mux_from(vc, vs);
    n++;
  }
  // extend audio past the last frame's START by its full duration
  // (CFR: one frame period; VFR: the log's last-entry duration)
  pump_audio(video_t + (vfr ? last_dur_t : in.fd / (double)in.fn));
  check(avcodec_send_frame(vc, nullptr), "flush video");
  mux_from(vc, vs);
  if (ac) {
    check(avcodec_send_frame(ac, nullptr), "flush audio");
    mux_from(ac, as);
  }
  check(av_write_trailer(oc), "write trailer");

  fprintf(stderr, "cvsim-av: %lld frames -> %s\n", (long long)n,
          a.out.c_str());
  av_packet_free(&opkt);
  av_packet_free(&wpkt);
  av_frame_free(&wframe);
  av_frame_free(&vf);
  if (wdec) avcodec_free_context(&wdec);
  if (wfc) avformat_close_input(&wfc);
  if (ac) avcodec_free_context(&ac);
  avcodec_free_context(&vc);
  if (!(oc->oformat->flags & AVFMT_NOFILE)) avio_closep(&oc->pb);
  avformat_free_context(oc);
  return 0;
}

}  // namespace

int main(int argc, char **argv) {
  if (argc < 2) {
    fprintf(stderr,
            "usage: cvsim-av probe|decode|decode-audio|encode [flags]\n");
    return 2;
  }
  av_log_set_level(AV_LOG_ERROR);
  std::string cmd = argv[1];
  Args a = parse_args(argc - 2, argv + 2);
  if (cmd == "probe") return cmd_probe(a);
  if (cmd == "decode") return cmd_decode(a);
  if (cmd == "decode-audio") return cmd_decode_audio(a);
  if (cmd == "encode") return cmd_encode(a);
  die("unknown command %s", cmd.c_str());
}

// GENERATED FILE — do not edit.
// Produced by tools/generate_ts_types.py from smelter_tpu/api/schema.py
// (the exact models the server validates requests against), mirroring the
// reference's api.generated.ts codegen pipeline.

export type ComponentId = string;
export type RendererId = string;
export type OutputId = string;
export type InputId = string;

export interface EasingLinear {
  function_name: "linear";
}

export interface EasingBounce {
  function_name: "bounce";
}

export interface EasingCubicBezier {
  function_name: "cubic_bezier";
  points: [number, number, number, number];
}

export interface ShaderParamF32 {
  type: "f32";
  value: number;
}

export interface ShaderParamU32 {
  type: "u32";
  value: number;
}

export interface ShaderParamI32 {
  type: "i32";
  value: number;
}

export interface ShaderParamStructField {
  field_name: string;
  type: string;
  value: unknown;
}

export interface ShaderParamStruct {
  type: "struct";
  value: ShaderParamStructField[];
}

export interface ShaderParamList {
  type: "list";
  value: (ShaderParamF32 | ShaderParamI32 | ShaderParamList | ShaderParamStruct | ShaderParamU32)[];
}

export interface InputStream {
  type: "input_stream";
  id?: string;
  input_id: string;
}

export interface Image {
  type: "image";
  id?: string;
  image_id: string;
  width?: number;
  height?: number;
}

export interface Text {
  type: "text";
  id?: string;
  text: string;
  width?: number;
  height?: number;
  max_width?: number;
  max_height?: number;
  font_size: number;
  line_height?: number;
  color?: string;
  background_color?: string;
  font_family?: string;
  style?: "normal" | "italic" | "oblique";
  align?: "left" | "right" | "justified" | "center";
  wrap?: "none" | "glyph" | "word";
  weight?: "thin" | "extra_light" | "light" | "normal" | "medium" | "semi_bold" | "bold" | "extra_bold" | "black";
}

export interface Transition {
  duration_ms: number;
  easing_function?: EasingBounce | EasingCubicBezier | EasingLinear;
  should_interrupt?: boolean;
}

export interface BoxShadow {
  offset_x?: number;
  offset_y?: number;
  color?: string;
  blur_radius?: number;
}

export interface Rescaler {
  type: "rescaler";
  id?: string;
  child: Image | InputStream | Rescaler | Shader | Text | Tiles | View | WebView;
  mode?: "fit" | "fill";
  horizontal_align?: "left" | "right" | "justified" | "center";
  vertical_align?: "top" | "center" | "bottom" | "justified";
  width?: number;
  height?: number;
  top?: number;
  left?: number;
  bottom?: number;
  right?: number;
  rotation?: number;
  transition?: Transition;
  border_radius?: number;
  border_width?: number;
  border_color?: string;
  box_shadow?: BoxShadow[];
}

export interface Tiles {
  type: "tiles";
  id?: string;
  children?: (Image | InputStream | Rescaler | Shader | Text | Tiles | View | WebView)[];
  width?: number;
  height?: number;
  background_color?: string;
  tile_aspect_ratio?: string;
  margin?: number;
  padding?: number;
  horizontal_align?: "left" | "right" | "justified" | "center";
  vertical_align?: "top" | "center" | "bottom" | "justified";
  transition?: Transition;
}

export interface Resolution {
  width: number;
  height: number;
}

export interface Shader {
  type: "shader";
  id?: string;
  children?: (Image | InputStream | Rescaler | Shader | Text | Tiles | View | WebView)[];
  shader_id: string;
  shader_param?: ShaderParamF32 | ShaderParamI32 | ShaderParamList | ShaderParamStruct | ShaderParamU32;
  resolution: Resolution;
}

export interface WebView {
  type: "web_view";
  id?: string;
  children?: (Image | InputStream | Rescaler | Shader | Text | Tiles | View | WebView)[];
  instance_id: string;
}

export interface View {
  type: "view";
  id?: string;
  children?: (Image | InputStream | Rescaler | Shader | Text | Tiles | View | WebView)[];
  width?: number;
  height?: number;
  direction?: "row" | "column";
  top?: number;
  left?: number;
  bottom?: number;
  right?: number;
  rotation?: number;
  transition?: Transition;
  overflow?: "visible" | "hidden" | "fit";
  background_color?: string;
  border_radius?: number;
  border_width?: number;
  border_color?: string;
  box_shadow?: BoxShadow[];
  padding?: number;
  padding_vertical?: number;
  padding_horizontal?: number;
  padding_top?: number;
  padding_right?: number;
  padding_bottom?: number;
  padding_left?: number;
}

export interface FfmpegH264Encoder {
  type: "ffmpeg_h264";
  preset?: "ultrafast" | "superfast" | "veryfast" | "faster" | "fast" | "medium" | "slow" | "slower" | "veryslow" | "placebo";
  bitrate?: Record<string, number> | number;
  keyframe_interval_ms?: number;
  pixel_format?: "yuv420p" | "yuv422p" | "yuv444p";
  ffmpeg_options?: Record<string, string>;
}

export interface FfmpegVp8Encoder {
  type: "ffmpeg_vp8";
  bitrate?: Record<string, number> | number;
  keyframe_interval_ms?: number;
  ffmpeg_options?: Record<string, string>;
}

export interface FfmpegVp9Encoder {
  type: "ffmpeg_vp9";
  bitrate?: Record<string, number> | number;
  keyframe_interval_ms?: number;
  pixel_format?: "yuv420p" | "yuv422p" | "yuv444p";
  ffmpeg_options?: Record<string, string>;
}

export interface FfmpegAv1Encoder {
  type: "ffmpeg_av1";
  bitrate?: Record<string, number> | number;
  keyframe_interval_ms?: number;
  pixel_format?: "yuv420p" | "yuv422p" | "yuv444p";
  ffmpeg_options?: Record<string, string>;
}

export interface AacEncoder {
  type: "aac";
  sample_rate?: number;
}

export interface OpusEncoder {
  type: "opus";
  preset?: "quality" | "voip" | "lowest_latency";
  sample_rate?: number;
  forward_error_correction?: boolean;
  expected_packet_loss?: number;
}

export interface VulkanH264Encoder {
  type: "vulkan_h264";
  bitrate?: Record<string, number> | number;
  keyframe_interval_ms?: number;
}

export interface AnyVideoEncoder {
  type: "any";
}

export interface AnyAudioEncoder {
  type: "any";
}

export interface OutputEndCondition {
  any_of?: string[];
  all_of?: string[];
  any_input?: boolean;
  all_inputs?: boolean;
}

export interface VideoScene {
  root: Image | InputStream | Rescaler | Shader | Text | Tiles | View | WebView;
}

export interface OutputVideoOptions {
  resolution: Resolution;
  send_eos_when?: OutputEndCondition;
  encoder: FfmpegAv1Encoder | FfmpegH264Encoder | FfmpegVp8Encoder | FfmpegVp9Encoder;
  initial: VideoScene;
}

export interface AudioSceneInput {
  input_id: string;
  volume?: number;
}

export interface AudioScene {
  inputs: AudioSceneInput[];
}

export interface OutputAudioOptions {
  mixing_strategy?: "sum_clip" | "sum_scale";
  send_eos_when?: OutputEndCondition;
  encoder: AacEncoder | OpusEncoder;
  channels?: "mono" | "stereo";
  initial: AudioScene;
}

export interface RtpOutput {
  type: "rtp_stream";
  port: number | string;
  ip?: string;
  transport_protocol?: "udp" | "tcp_server";
  video?: OutputVideoOptions;
  audio?: OutputAudioOptions;
}

export interface RtmpOutput {
  type: "rtmp_client";
  url: string;
  video?: OutputVideoOptions;
  audio?: OutputAudioOptions;
}

export interface MoqClientOutput {
  type: "moq_client";
  endpoint_url: string;
  broadcast_path: string;
  container?: "legacy" | "cmaf" | "loc";
  video?: OutputVideoOptions;
  audio?: OutputAudioOptions;
}

export interface Mp4Output {
  type: "mp4";
  path: string;
  video?: OutputVideoOptions;
  audio?: OutputAudioOptions;
  ffmpeg_options?: Record<string, string>;
}

export interface WhipOutputVideoOptions {
  resolution: Resolution;
  send_eos_when?: OutputEndCondition;
  encoder?: FfmpegAv1Encoder | FfmpegH264Encoder | FfmpegVp8Encoder | FfmpegVp9Encoder;
  encoder_preferences?: (AnyVideoEncoder | FfmpegAv1Encoder | FfmpegH264Encoder | FfmpegVp8Encoder | FfmpegVp9Encoder | VulkanH264Encoder)[];
  initial: VideoScene;
}

export interface WhipOutputAudioOptions {
  mixing_strategy?: "sum_clip" | "sum_scale";
  send_eos_when?: OutputEndCondition;
  encoder?: AacEncoder | OpusEncoder;
  encoder_preferences?: (AnyAudioEncoder | OpusEncoder)[];
  channels?: "mono" | "stereo";
  initial: AudioScene;
}

export interface WhipOutput {
  type: "whip_client";
  endpoint_url: string;
  bearer_token?: string;
  video?: WhipOutputVideoOptions;
  audio?: WhipOutputAudioOptions;
}

export interface WhepOutput {
  type: "whep_server";
  bearer_token?: string;
  video?: WhipOutputVideoOptions;
  audio?: WhipOutputAudioOptions;
}

export interface HlsOutput {
  type: "hls";
  path: string;
  max_playlist_size?: number;
  video?: OutputVideoOptions;
  audio?: OutputAudioOptions;
  ffmpeg_options?: Record<string, string>;
}

export interface RtpInputVideoOptions {
  decoder?: string;
}

export interface RtpInputAudioOptions {
  decoder?: string;
  sample_rate?: number;
  forward_error_correction?: boolean;
  audio_specific_config?: string;
}

export interface RtpInput {
  type: "rtp_stream";
  port: number | string;
  transport_protocol?: "udp" | "tcp_server";
  video?: RtpInputVideoOptions;
  audio?: RtpInputAudioOptions;
  required?: boolean;
  offset_ms?: number;
  buffer_size_ms?: number;
  jitter_buffer?: Record<string, unknown>;
  side_channel?: Record<string, unknown>;
}

export interface RtmpInput {
  type: "rtmp_server";
  port?: number;
  app?: string;
  stream_key?: string;
  required?: boolean;
  offset_ms?: number;
  decoder_map?: Record<string, string>;
  side_channel?: Record<string, unknown>;
}

export interface MoqServerInput {
  type: "moq_server";
  auth_token: string;
  required?: boolean;
  decoder_map?: Record<string, string>;
  side_channel?: Record<string, unknown>;
}

export interface MoqClientInput {
  type: "moq_client";
  endpoint_url: string;
  broadcast_path: string;
  required?: boolean;
  offset_ms?: number;
  decoder_map?: Record<string, string>;
  side_channel?: Record<string, unknown>;
}

export interface Mp4Input {
  type: "mp4";
  url?: string;
  path?: string;
  loop_?: boolean;
  required?: boolean;
  offset_ms?: number;
  seek_ms?: number;
  decoder_map?: Record<string, string>;
  side_channel?: Record<string, unknown>;
}

export interface WhipInput {
  type: "whip_server";
  bearer_token?: string;
  video?: Record<string, unknown>;
  required?: boolean;
  offset_ms?: number;
  buffer_size_ms?: number;
  side_channel?: Record<string, unknown>;
}

export interface WhepInput {
  type: "whep_client";
  endpoint_url: string;
  bearer_token?: string;
  video?: Record<string, unknown>;
  required?: boolean;
  offset_ms?: number;
  buffer_size_ms?: number;
  side_channel?: Record<string, unknown>;
}

export interface HlsInput {
  type: "hls";
  url: string;
  required?: boolean;
  offset_ms?: number;
  decoder_map?: Record<string, string>;
  side_channel?: Record<string, unknown>;
}

export interface V4l2Input {
  type: "v4l2";
  path?: string;
  device_path?: string;
  format?: string;
  resolution?: Resolution;
  framerate?: number;
  required?: boolean;
  offset_ms?: number;
  side_channel?: Record<string, unknown>;
}

export interface DeckLinkInput {
  type: "decklink";
  subdevice_index?: number;
  display_name?: string;
  persistent_id?: string;
  enable_audio?: boolean;
  required?: boolean;
}

export interface UpdateOutputRequest {
  video?: VideoScene;
  audio?: AudioScene;
  schedule_time_ms?: number;
}

export interface ShaderSpec {
  source: string;
}

export interface ImageSpec {
  url?: string;
  path?: string;
  asset_type?: "png" | "jpeg" | "svg" | "gif" | "auto";
  resolution?: Resolution;
}

export interface WebRendererSpec {
  url: string;
  resolution: Resolution;
  embedding_method?: string;
}

export interface FontSpec {
  url?: string;
  path?: string;
}

export type EasingFunction = EasingBounce | EasingCubicBezier | EasingLinear;
export type ShaderParam = ShaderParamF32 | ShaderParamI32 | ShaderParamList | ShaderParamStruct | ShaderParamU32;
export type Component = Image | InputStream | Rescaler | Shader | Text | Tiles | View | WebView;
export type VideoEncoderOptions = FfmpegAv1Encoder | FfmpegH264Encoder | FfmpegVp8Encoder | FfmpegVp9Encoder;
export type AudioEncoderOptions = AacEncoder | OpusEncoder;
export type WhipVideoEncoderPreference = AnyVideoEncoder | FfmpegAv1Encoder | FfmpegH264Encoder | FfmpegVp8Encoder | FfmpegVp9Encoder | VulkanH264Encoder;
export type WhipAudioEncoderPreference = AnyAudioEncoder | OpusEncoder;
export type RegisterOutput = HlsOutput | MoqClientOutput | Mp4Output | RtmpOutput | RtpOutput | WhepOutput | WhipOutput;
export type RegisterInput = DeckLinkInput | HlsInput | MoqClientInput | MoqServerInput | Mp4Input | RtmpInput | RtpInput | V4l2Input | WhepInput | WhipInput;

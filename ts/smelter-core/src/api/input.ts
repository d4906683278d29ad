/**
 * camelCase RegisterInput -> wire-format request bodies. Every emitted key
 * must be an accepted field of the server's deny-unknown-fields schema
 * (smelter_tpu/api/schema.py *Input models) — statically cross-checked by
 * tests/test_ts_sdk_source.py.
 */
import type { Api, Inputs } from '@smelter-tpu/smelter';
import { _smelterInternals } from '@smelter-tpu/smelter';

export type InputRef = _smelterInternals.InputRef;
export const inputRefIntoRawId = _smelterInternals.inputRefIntoRawId;
export const parseInputRef = _smelterInternals.parseInputRef;

export type RegisterInput =
  | ({ type: 'rtp_stream' } & Inputs.RegisterRtpInput)
  | ({ type: 'mp4' } & Inputs.RegisterMp4Input)
  | ({ type: 'hls' } & Inputs.RegisterHlsInput)
  | ({ type: 'whip_server' } & Inputs.RegisterWhipServerInput)
  | ({ type: 'whep_client' } & Inputs.RegisterWhepClientInput)
  | ({ type: 'rtmp_server' } & Inputs.RegisterRtmpServerInput)
  | ({ type: 'moq_server' } & Inputs.RegisterMoqServerInput)
  | ({ type: 'moq_client' } & Inputs.RegisterMoqClientInput)
  | ({ type: 'v4l2' } & Inputs.RegisterV4l2Input);

export type RegisterInputRequest = Api.RegisterInput;

type WireSideChannel = {
  video?: boolean;
  audio?: boolean;
  delay_ms?: number;
};

function intoSideChannel(sideChannel?: Inputs.SideChannel): WireSideChannel | undefined {
  if (!sideChannel) {
    return undefined;
  }
  return {
    video: sideChannel.video,
    audio: sideChannel.audio,
    delay_ms: sideChannel.delayMs,
  };
}

function intoRtpAudio(audio: Inputs.InputRtpAudioOptions) {
  if (audio.decoder === 'opus') {
    return {
      decoder: 'opus',
      forward_error_correction: audio.forwardErrorCorrection,
    };
  }
  if (audio.decoder === 'aac') {
    return {
      decoder: 'aac',
      audio_specific_config: audio.audioSpecificConfig,
    };
  }
  throw new Error(`Unknown audio decoder type: ${(audio as { decoder: string }).decoder}`);
}

export function intoRegisterInput(input: RegisterInput): RegisterInputRequest {
  switch (input.type) {
    case 'mp4':
      return {
        type: 'mp4',
        url: input.url ?? undefined,
        path: input.serverPath ?? undefined,
        loop: input.loop ?? undefined,
        required: input.required ?? undefined,
        offset_ms: input.offsetMs ?? undefined,
        seek_ms: input.seekMs ?? undefined,
        decoder_map: input.decoderMap ?? undefined,
        side_channel: intoSideChannel(input.sideChannel),
      } as RegisterInputRequest;
    case 'hls':
      return {
        type: 'hls',
        url: input.url,
        required: input.required ?? undefined,
        offset_ms: input.offsetMs ?? undefined,
        decoder_map: input.decoderMap ?? undefined,
        side_channel: intoSideChannel(input.sideChannel),
      } as RegisterInputRequest;
    case 'rtp_stream':
      return {
        type: 'rtp_stream',
        port: input.port,
        transport_protocol: input.transportProtocol ?? undefined,
        video: input.video ?? undefined,
        audio: input.audio ? intoRtpAudio(input.audio) : undefined,
        required: input.required ?? undefined,
        offset_ms: input.offsetMs ?? undefined,
        buffer_size_ms: input.bufferSizeMs ?? undefined,
        side_channel: intoSideChannel(input.sideChannel),
      } as RegisterInputRequest;
    case 'whip_server':
      return {
        type: 'whip_server',
        video: input.video
          ? { decoder_preferences: input.video.decoderPreferences ?? undefined }
          : undefined,
        bearer_token: input.bearerToken,
        required: input.required ?? undefined,
        buffer_size_ms: input.bufferSizeMs ?? undefined,
        side_channel: intoSideChannel(input.sideChannel),
      } as RegisterInputRequest;
    case 'whep_client':
      return {
        type: 'whep_client',
        endpoint_url: input.endpointUrl,
        bearer_token: input.bearerToken,
        video: input.video
          ? { decoder_preferences: input.video.decoderPreferences ?? undefined }
          : undefined,
        required: input.required ?? undefined,
        buffer_size_ms: input.bufferSizeMs ?? undefined,
        side_channel: intoSideChannel(input.sideChannel),
      } as RegisterInputRequest;
    case 'rtmp_server':
      return {
        type: 'rtmp_server',
        stream_key: input.streamKey,
        port: input.port,
        app: input.app,
        required: input.required ?? undefined,
        offset_ms: input.offsetMs ?? undefined,
        decoder_map: input.decoderMap ?? undefined,
        side_channel: intoSideChannel(input.sideChannel),
      } as RegisterInputRequest;
    case 'moq_server':
      return {
        type: 'moq_server',
        auth_token: input.authToken,
        required: input.required ?? undefined,
        decoder_map: input.decoderMap ?? undefined,
        side_channel: intoSideChannel(input.sideChannel),
      } as RegisterInputRequest;
    case 'moq_client':
      return {
        type: 'moq_client',
        endpoint_url: input.endpointUrl,
        broadcast_path: input.broadcastPath,
        required: input.required ?? undefined,
        decoder_map: input.decoderMap ?? undefined,
        side_channel: intoSideChannel(input.sideChannel),
      } as RegisterInputRequest;
    case 'v4l2':
      return {
        type: 'v4l2',
        path: input.path,
        format: input.format,
        resolution: input.resolution ?? undefined,
        framerate: input.framerate ?? undefined,
        required: input.required ?? undefined,
        side_channel: intoSideChannel(input.sideChannel),
      } as RegisterInputRequest;
    default:
      throw new Error(`Unknown input type ${(input as { type: string }).type}`);
  }
}

/**
 * camelCase RegisterOutput -> wire-format request bodies, with the initial
 * scene (rendered by the reconciler) attached. Emitted keys must be
 * accepted fields of smelter_tpu/api/schema.py *Output models
 * (cross-checked by tests/test_ts_sdk_source.py).
 */
import type { Api, Outputs } from '@smelter-tpu/smelter';
import { _smelterInternals } from '@smelter-tpu/smelter';
import { inputRefIntoRawId } from './input.js';

export type RegisterOutput =
  | ({ type: 'rtp_stream' } & Outputs.RegisterRtpOutput)
  | ({ type: 'mp4' } & Outputs.RegisterMp4Output)
  | ({ type: 'hls' } & Outputs.RegisterHlsOutput)
  | ({ type: 'whip_client' } & Outputs.RegisterWhipClientOutput)
  | ({ type: 'whep_server' } & Outputs.RegisterWhepServerOutput)
  | ({ type: 'rtmp_client' } & Outputs.RegisterRtmpClientOutput)
  | ({ type: 'moq_client' } & Outputs.RegisterMoqClientOutput);

export type RegisterOutputRequest = Api.RegisterOutput;

type InitialScene = { video?: Api.VideoScene; audio?: Api.AudioScene };

function intoEndCondition(cond?: Outputs.OutputEndCondition | null) {
  if (!cond) {
    return undefined;
  }
  if ('anyOf' in cond) {
    return { any_of: cond.anyOf };
  }
  if ('allOf' in cond) {
    return { all_of: cond.allOf };
  }
  if ('anyInput' in cond) {
    return { any_input: cond.anyInput };
  }
  if ('allInputs' in cond) {
    return { all_inputs: cond.allInputs };
  }
  return undefined;
}

function intoBitrate(bitrate?: Outputs.VideoEncoderBitrate) {
  if (bitrate === undefined) {
    return undefined;
  }
  if (typeof bitrate === 'number') {
    return bitrate;
  }
  return {
    average_bitrate: bitrate.averageBitrate,
    max_bitrate: bitrate.maxBitrate,
  };
}

export function intoVideoEncoder(encoder: Outputs.VideoEncoderOptions) {
  const common = {
    type: encoder.type,
    bitrate: intoBitrate(encoder.bitrate),
    keyframe_interval_ms: encoder.keyframeIntervalMs,
    ffmpeg_options: encoder.ffmpegOptions,
  };
  if (encoder.type === 'ffmpeg_h264') {
    return { ...common, preset: encoder.preset, pixel_format: encoder.pixelFormat };
  }
  if (encoder.type === 'ffmpeg_vp9' || encoder.type === 'ffmpeg_av1') {
    return { ...common, pixel_format: encoder.pixelFormat };
  }
  return common;
}

export function intoAudioEncoder(encoder: Outputs.AudioEncoderOptions) {
  if (encoder.type === 'aac') {
    return { type: 'aac', sample_rate: encoder.sampleRate };
  }
  return {
    type: 'opus',
    preset: encoder.preset,
    sample_rate: encoder.sampleRate,
    forward_error_correction: encoder.forwardErrorCorrection,
    expected_packet_loss: encoder.expectedPacketLoss,
  };
}

function intoVideoOptions(
  video: Outputs.OutputVideoOptions,
  initial: InitialScene
) {
  return {
    resolution: video.resolution,
    send_eos_when: intoEndCondition(video.sendEosWhen),
    encoder: intoVideoEncoder(video.encoder),
    initial: initial.video,
  };
}

function intoAudioOptions(
  audio: Outputs.OutputAudioOptions,
  initial: InitialScene
) {
  return {
    channels: audio.channels ?? undefined,
    mixing_strategy: audio.mixingStrategy ?? undefined,
    send_eos_when: intoEndCondition(audio.sendEosWhen),
    encoder: intoAudioEncoder(audio.encoder),
    initial: initial.audio,
  };
}

function intoWhipVideoOptions(
  video: Outputs.WhipVideoOptions,
  initial: InitialScene
) {
  return {
    resolution: video.resolution,
    send_eos_when: intoEndCondition(video.sendEosWhen),
    encoder_preferences: video.encoderPreferences?.map(pref =>
      pref.type === 'any' ? { type: 'any' } : intoVideoEncoder(pref)
    ),
    initial: initial.video,
  };
}

function intoWhipAudioOptions(
  audio: true | Outputs.WhipAudioOptions,
  initial: InitialScene
) {
  if (audio === true) {
    return {
      encoder_preferences: [{ type: 'opus' }, { type: 'any' }],
      initial: initial.audio,
    };
  }
  return {
    channels: audio.channels ?? undefined,
    mixing_strategy: audio.mixingStrategy ?? undefined,
    send_eos_when: intoEndCondition(audio.sendEosWhen),
    encoder_preferences: audio.encoderPreferences?.map(pref =>
      pref.type === 'any' ? { type: 'any' } : intoAudioEncoder(pref)
    ),
    initial: initial.audio,
  };
}

export function intoRegisterOutput(
  output: RegisterOutput,
  initial: InitialScene
): RegisterOutputRequest {
  if (!('video' in output && output.video) && !('audio' in output && output.audio)) {
    throw new Error('Either audio or video field needs to be specified.');
  }
  switch (output.type) {
    case 'rtp_stream':
      return {
        type: 'rtp_stream',
        port: output.port,
        ip: output.ip ?? undefined,
        transport_protocol: output.transportProtocol,
        video: output.video && intoVideoOptions(output.video, initial),
        audio: output.audio && intoAudioOptions(output.audio, initial),
      } as RegisterOutputRequest;
    case 'mp4':
      return {
        type: 'mp4',
        path: output.serverPath,
        video: output.video && intoVideoOptions(output.video, initial),
        audio: output.audio && intoAudioOptions(output.audio, initial),
        ffmpeg_options: output.ffmpegOptions,
      } as RegisterOutputRequest;
    case 'hls':
      return {
        type: 'hls',
        path: output.serverPath,
        max_playlist_size: output.maxPlaylistSize ?? undefined,
        video: output.video && intoVideoOptions(output.video, initial),
        audio: output.audio && intoAudioOptions(output.audio, initial),
        ffmpeg_options: output.ffmpegOptions,
      } as RegisterOutputRequest;
    case 'whip_client':
      return {
        type: 'whip_client',
        endpoint_url: output.endpointUrl,
        bearer_token: output.bearerToken ?? undefined,
        video: output.video ? intoWhipVideoOptions(output.video, initial) : undefined,
        audio: output.audio ? intoWhipAudioOptions(output.audio, initial) : undefined,
      } as RegisterOutputRequest;
    case 'whep_server':
      return {
        type: 'whep_server',
        bearer_token: output.bearerToken ?? undefined,
        video: output.video ? intoWhipVideoOptions(output.video, initial) : undefined,
        audio: output.audio ? intoWhipAudioOptions(output.audio, initial) : undefined,
      } as RegisterOutputRequest;
    case 'rtmp_client':
      return {
        type: 'rtmp_client',
        url: output.url,
        video: output.video && intoVideoOptions(output.video, initial),
        audio: output.audio && intoAudioOptions(output.audio, initial),
      } as RegisterOutputRequest;
    case 'moq_client':
      return {
        type: 'moq_client',
        endpoint_url: output.endpointUrl,
        broadcast_path: output.broadcastPath,
        container: output.container ?? undefined,
        video: output.video && intoVideoOptions(output.video, initial),
        audio: output.audio && intoAudioOptions(output.audio, initial),
      } as RegisterOutputRequest;
    default:
      throw new Error(`Unknown output type ${(output as { type: string }).type}`);
  }
}

export function intoAudioInputsConfiguration(
  inputs: _smelterInternals.AudioConfig
): Api.AudioScene {
  return {
    inputs: inputs.map(input => ({
      input_id: inputRefIntoRawId(input.inputRef),
      volume: input.volume,
    })),
  };
}

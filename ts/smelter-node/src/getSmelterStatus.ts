/** Typed wrapper over GET /status (server routes/status block). */
import type { SmelterManager } from '@smelter-tpu/smelter-core';

export type SmelterStatus = {
  instanceId: string;
  configuration: {
    apiPort: number;
    outputFramerate: number;
    mixingSampleRate: number;
    aheadOfTimeProcessing: boolean;
    neverDropOutputFrames: boolean;
    runLateScheduledEvents: boolean;
    downloadRoot: string;
    webRendererEnable: boolean;
    whipWhepServerPort: number;
    whipWhepEnable: boolean;
    renderingMode: string;
  };
  inputs: Array<{ inputId: string; inputType: string }>;
  outputs: Array<{ outputId: string; outputType: string }>;
};

export async function getSmelterStatus(manager: SmelterManager): Promise<SmelterStatus> {
  const raw = (await manager.sendRequest({ method: 'GET', route: '/status' })) as {
    instance_id: string;
    configuration: Record<string, unknown>;
    inputs: Array<{ input_id: string; input_type: string }>;
    outputs: Array<{ output_id: string; output_type: string }>;
  };
  const config = raw.configuration ?? {};
  return {
    instanceId: raw.instance_id,
    configuration: {
      apiPort: config.api_port as number,
      outputFramerate: config.output_framerate as number,
      mixingSampleRate: config.mixing_sample_rate as number,
      aheadOfTimeProcessing: config.ahead_of_time_processing as boolean,
      neverDropOutputFrames: config.never_drop_output_frames as boolean,
      runLateScheduledEvents: config.run_late_scheduled_events as boolean,
      downloadRoot: config.download_root as string,
      webRendererEnable: config.web_renderer_enable as boolean,
      whipWhepServerPort: config.whip_whep_server_port as number,
      whipWhepEnable: config.whip_whep_enable as boolean,
      renderingMode: config.rendering_mode as string,
    },
    inputs: (raw.inputs ?? []).map(input => ({
      inputId: input.input_id,
      inputType: input.input_type,
    })),
    outputs: (raw.outputs ?? []).map(output => ({
      outputId: output.output_id,
      outputType: output.output_type,
    })),
  };
}

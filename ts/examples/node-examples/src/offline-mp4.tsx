/**
 * Offline (AOT) example: deterministically render two MP4 clips side by
 * side with a lower-third, as fast as the machine allows — the offline
 * compositor steps the React timeline and the server processes ahead of
 * time (SMELTER_OFFLINE_PROCESSING_ENABLE=true on the instance).
 */
import { OfflineSmelter, ExistingInstanceManager } from '@smelter-tpu/smelter-node';
import { InputStream, Rescaler, Text, View } from '@smelter-tpu/smelter';

function Scene() {
  return (
    <View style={{ backgroundColor: '#000000FF' }}>
      <Rescaler>
        <InputStream inputId="left" />
      </Rescaler>
      <Rescaler>
        <InputStream inputId="right" />
      </Rescaler>
      <View style={{ bottom: 0, left: 0, height: 80, backgroundColor: '#00000099' }}>
        <Text style={{ fontSize: 48, color: '#FFFFFFFF' }}>offline render</Text>
      </View>
    </View>
  );
}

async function run() {
  const smelter = new OfflineSmelter(
    new ExistingInstanceManager({
      url: `http://127.0.0.1:${process.env.SMELTER_API_PORT ?? 8081}`,
    })
  );
  await smelter.init();

  await smelter.registerInput('left', {
    type: 'mp4',
    serverPath: '/tmp/left.mp4',
    required: true,
    offsetMs: 0,
  });
  await smelter.registerInput('right', {
    type: 'mp4',
    serverPath: '/tmp/right.mp4',
    required: true,
    offsetMs: 0,
  });

  await smelter.render(
    <Scene />,
    {
      type: 'mp4',
      serverPath: '/tmp/side-by-side.mp4',
      video: {
        resolution: { width: 1920, height: 1080 },
        encoder: { type: 'ffmpeg_h264', preset: 'medium' },
      },
      audio: {
        encoder: { type: 'aac' },
      },
    },
    15_000
  );
}

void run();

/**
 * Dynamic-inputs example: every connected input stream lands in a Tiles
 * grid automatically via useInputStreams(); inputs register over RTP while
 * the output runs.
 */
import Smelter, { ExistingInstanceManager } from '@smelter-tpu/smelter-node';
import { InputStream, Text, Tiles, useInputStreams, View } from '@smelter-tpu/smelter';

function InputGrid() {
  const inputs = useInputStreams();
  const playing = Object.values(inputs).filter(
    input => input.videoState === 'playing'
  );
  return (
    <View style={{ backgroundColor: '#101010FF' }}>
      {playing.length === 0 ? (
        <Text style={{ fontSize: 40 }}>waiting for inputs…</Text>
      ) : (
        <Tiles style={{ margin: 8 }} transition={{ durationMs: 300 }}>
          {playing.map(input => (
            <InputStream key={String(input.inputId)} inputId={String(input.inputId)} />
          ))}
        </Tiles>
      )}
    </View>
  );
}

async function run() {
  const smelter = new Smelter(
    new ExistingInstanceManager({
      url: `http://127.0.0.1:${process.env.SMELTER_API_PORT ?? 8081}`,
    })
  );
  await smelter.init();

  await smelter.registerOutput('grid', <InputGrid />, {
    type: 'mp4',
    serverPath: '/tmp/dynamic-inputs.mp4',
    video: {
      resolution: { width: 1920, height: 1080 },
      encoder: { type: 'ffmpeg_h264', preset: 'veryfast' },
    },
    audio: {
      encoder: { type: 'aac' },
    },
  });
  await smelter.start();

  // register two RTP inputs after start; the grid re-lays out on its own
  const first = await smelter.registerInput('cam_1', {
    type: 'rtp_stream',
    port: 41000,
    video: { decoder: 'ffmpeg_h264' },
  });
  console.log('cam_1 listening on port', first.port);
  await new Promise(resolve => setTimeout(resolve, 5_000));
  await smelter.registerInput('cam_2', {
    type: 'rtp_stream',
    port: 41002,
    video: { decoder: 'ffmpeg_h264' },
    audio: { decoder: 'opus' },
  });

  await new Promise(resolve => setTimeout(resolve, 30_000));
  await smelter.terminate();
}

void run();

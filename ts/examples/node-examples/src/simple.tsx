/**
 * Minimal live example: a counter scene re-rendered by React state,
 * streamed to an MP4 file output. Run against a smelter-tpu server:
 *   SMELTER_API_PORT=8081 npm run simple
 */
import { useEffect, useState } from 'react';
import Smelter, { ExistingInstanceManager } from '@smelter-tpu/smelter-node';
import { Text, View } from '@smelter-tpu/smelter';

function Counter() {
  const [count, setCount] = useState(0);
  useEffect(() => {
    const timeout = setTimeout(() => setCount(count + 1), 1000);
    return () => clearTimeout(timeout);
  });
  return (
    <View style={{ direction: 'column', backgroundColor: '#103070FF' }}>
      <Text style={{ fontSize: 48, color: '#FFFFFFFF' }}>smelter-tpu</Text>
      <Text style={{ fontSize: 32 }}>Counter: {count}</Text>
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

  await smelter.registerOutput('output_1', <Counter />, {
    type: 'mp4',
    serverPath: '/tmp/simple-example.mp4',
    video: {
      resolution: { width: 1280, height: 720 },
      encoder: { type: 'ffmpeg_h264', preset: 'fast' },
    },
  });

  await smelter.start();
  await new Promise(resolve => setTimeout(resolve, 10_000));
  await smelter.unregisterOutput('output_1');
  await smelter.terminate();
}

void run();

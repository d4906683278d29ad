import { useEffect, useState } from 'react';
import Smelter, { ExistingInstanceManager } from '@smelter-tpu/smelter-node';
import { Text, View } from '@smelter-tpu/smelter';

function App() {
  const [count, setCount] = useState(0);
  useEffect(() => {
    const timeout = setTimeout(() => setCount(count + 1), 1000);
    return () => clearTimeout(timeout);
  });
  return (
    <View style={{ direction: 'column', backgroundColor: '#161B33FF' }}>
      <Text style={{ fontSize: 50, color: '#FFFFFFFF' }}>Hello smelter-tpu</Text>
      <Text style={{ fontSize: 30 }}>Uptime: {count}s</Text>
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
  await smelter.registerOutput('preview', <App />, {
    type: 'mp4',
    serverPath: '/tmp/smelter-app.mp4',
    video: {
      resolution: { width: 1280, height: 720 },
      encoder: { type: 'ffmpeg_h264', preset: 'fast' },
    },
  });
  await smelter.start();
  await new Promise(resolve => setTimeout(resolve, 15_000));
  await smelter.terminate();
}

void run();

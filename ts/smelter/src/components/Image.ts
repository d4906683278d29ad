/**
 * Image component. Either references a globally registered image
 * (imageId) or registers its own output-scoped image from `source`
 * (URL or server path) and renders an empty View until ready.
 */
import { createElement, useEffect, useState } from 'react';
import type * as Api from '../api.js';
import type { ComponentBaseProps, SceneFragment } from '../scene.js';
import { sceneNode } from '../scene.js';
import { useRuntime } from '../runtime.js';
import {
  imageRefIntoRawId,
  OUTPUT_SPECIFIC_IMAGE_TYPE,
} from '../types/refs/imageRef.js';
import View from './View.js';

export type ImageStyleProps = {
  width?: number;
  height?: number;
};

export type ImageProps = Omit<ComponentBaseProps, 'children'> &
  (
    | { imageId: Api.RendererId; source?: never }
    | { source: string; imageId?: never }
  ) & {
    style?: ImageStyleProps;
  };

type RawImageProps = Omit<ImageProps, 'imageId' | 'source'> & { imageId: string };

function sceneBuilder(props: RawImageProps, _children: SceneFragment[]): Api.Component {
  return {
    type: 'image',
    id: props.id,
    image_id: props.imageId,
    width: props.style?.width,
    height: props.style?.height,
  };
}

export const RawImage = sceneNode<RawImageProps>('image', sceneBuilder);

function Image(props: ImageProps) {
  const runtime = useRuntime();
  const [scoped, setScoped] = useState<{ handle: number; ready: boolean } | null>(null);

  if ((props.imageId && props.source) || (!props.imageId && !props.source)) {
    throw new Error('Either "imageId" or "source" must be provided, but not both.');
  }

  useEffect(() => {
    if (!props.source) {
      return;
    }
    const source = props.source;
    const handle = runtime.allocHandle();
    setScoped({ handle, ready: false });

    const release = runtime.clock.hold();
    const registration = (async () => {
      try {
        const isHttp =
          source.startsWith('http://') || source.startsWith('https://');
        await runtime.addImageAsset(handle, {
          url: isHttp ? source : undefined,
          serverPath: isHttp ? undefined : source,
          assetType: 'auto',
        });
        setScoped({ handle, ready: true });
      } finally {
        release();
      }
    })();
    return () => {
      release();
      void registration
        .catch(() => undefined)
        .then(() => runtime.removeImageAsset(handle));
    };
  }, [props.source, props.imageId]);

  if (props.imageId) {
    return createElement(RawImage, {
      ...props,
      imageId: imageRefIntoRawId({ type: 'global', id: props.imageId as string }),
    });
  }
  if (!scoped?.ready) {
    return createElement(View, {});
  }
  return createElement(RawImage, {
    ...props,
    imageId: imageRefIntoRawId({
      type: OUTPUT_SPECIFIC_IMAGE_TYPE,
      id: scoped.handle,
      outputId: runtime.outputId,
    }),
  });
}

export default Image;
